package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Consistent cross-artifact snapshots for the maintained-artifact
  * tier (round-19 verdict #1). The artifact families each version
  * independently — LshIndexStream batches/bases, IvfIndexStream
  * generations, ClusterIndexStream versions, the warehouse batch
  * artifacts — and compaction/GC used to reclaim superseded dirs
  * immediately, so a reader joining ACROSS families (q294's audit
  * surface) could observe mixed versions, and a long scan could hit
  * FileNotFound when a concurrent compaction swept its input dirs.
  *
  * A manifest is a tiny key=value file pinning, per snapshot, each
  * family's version token (batch id / generation / base / artifact
  * path), published write-once through [[MarkerProtocol]] under
  * `<root>/_manifests/manifest=<id>` — the same crash-safe
  * tmp+marker+rename lifecycle as the artifacts themselves, so a
  * half-written manifest is marker-less debris readers skip.
  * Readers resolve versions through ONE complete manifest and see a
  * single consistent world; each family's GC honors a RETENTION
  * FLOOR derived from the oldest live manifest (the VACUUM-style
  * grace): a version some live manifest pins is never reclaimed,
  * and dropping the manifest (the reader lease ending) is what
  * releases its dirs to the next GC pass. With no manifests
  * published, every GC keeps its round-19 immediate-reclaim
  * behavior — the tier is pay-for-what-you-pin.
  *
  * Entry keys are namespaced per family ("lsh.base",
  * "ivf.gen", "cluster.version", ...) so one manifest can span any
  * number of families rooted anywhere — the cross-artifact case
  * passes the shared manifest root to every family's GC.
  */
object SnapshotManifest {

  private def manifestsDir(root: String) = s"$root/_manifests"

  private def confOf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def fsOf(conf: Configuration, p: String) =
    new Path(p).getFileSystem(conf)

  private def listIds(conf: Configuration, root: String,
      completeOnly: Boolean): Seq[Long] = {
    val dir = new Path(manifestsDir(root))
    val fs = fsOf(conf, root)
    val sts =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] }
    sts.toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("manifest="))
      .filter(st => !completeOnly ||
        fs.exists(new Path(st.getPath, MarkerProtocol.Marker)))
      .map(_.getPath.getName.stripPrefix("manifest=").toLong)
      .sorted
  }

  /** Publish `entries` as the next snapshot; returns its id. The
    * write-once publish makes a concurrent allocation race collapse
    * to one winner per id — the loser retries on the next id. */
  def publish(spark: SparkSession, root: String,
      entries: Map[String, String]): Long = {
    val fs = fsOf(confOf(spark), root)
    var id = listIds(confOf(spark), root, completeOnly = false).lastOption
      .map(_ + 1).getOrElse(0L)
    var won = false
    while (!won) {
      // deleteDebris=false: manifest ids are allocated by RACING
      // publishers (collapse-to-one-winner by design), so another
      // publisher's same-id tmp is an in-flight write, not crash
      // debris — sweeping it could publish a COMPLETE manifest with
      // no entries file (round-20 ADVICE #1). Loser tmps are deleted
      // by their own publish() calls; true crash debris under
      // _manifests is marker-less and readers skip it.
      won = MarkerProtocol.publish(spark,
        s"${manifestsDir(root)}/manifest=$id", overwrite = false,
        deleteDebris = false) { tmp =>
        val out = fs.create(new Path(tmp, "entries"), true)
        val text = entries.toSeq.sorted
          .map { case (k, v) => s"$k=$v" }.mkString("\n")
        out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      }
      if (!won) id += 1
    }
    id
  }

  /** Pinned entries of manifest `id`, if complete. */
  def read(spark: SparkSession, root: String,
      id: Long): Option[Map[String, String]] =
    readC(confOf(spark), root, id)

  def readC(conf: Configuration, root: String,
      id: Long): Option[Map[String, String]] = {
    val fs = fsOf(conf, root)
    val dir = new Path(s"${manifestsDir(root)}/manifest=$id")
    if (!fs.exists(new Path(dir, MarkerProtocol.Marker))) return None
    // a marker-present dir WITHOUT an entries file is debris (e.g. a
    // partial object-store rename), not a readable manifest — treat
    // as incomplete so readers, liveC/newest and GC floors skip it
    // instead of crashing every compact/gc/pinned read at this root
    // until the dir is hand-deleted (round-20 ADVICE #2)
    if (!fs.exists(new Path(dir, "entries"))) return None
    val in = fs.open(new Path(dir, "entries"))
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    Some(text.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      line.take(i) -> line.drop(i + 1)
    }.toMap)
  }

  /** Complete manifests, ascending: the live reader leases. */
  def live(spark: SparkSession, root: String)
      : Seq[(Long, Map[String, String])] =
    liveC(confOf(spark), root)

  def liveC(conf: Configuration, root: String)
      : Seq[(Long, Map[String, String])] =
    listIds(conf, root, completeOnly = true)
      .flatMap(id => readC(conf, root, id).map(id -> _))

  /** Newest complete manifest — what a fresh reader resolves. */
  def newest(spark: SparkSession, root: String)
      : Option[(Long, Map[String, String])] =
    live(spark, root).lastOption

  /** Release a reader lease: the dropped manifest no longer floors
    * any GC. Deleting the marker first makes the drop atomic to
    * concurrent floor computations (a marker-less manifest is not
    * live). */
  def drop(spark: SparkSession, root: String, id: Long): Unit = {
    val fs = fsOf(confOf(spark), root)
    val dir = new Path(s"${manifestsDir(root)}/manifest=$id")
    fs.delete(new Path(dir, MarkerProtocol.Marker), false)
    fs.delete(dir, true)
    ()
  }

  /** The retention floor for one pinned long-valued key: the MINIMUM
    * value any live manifest pins under `key`, or None when no live
    * manifest pins it (GC is then unconstrained by this key). */
  def floor(spark: SparkSession, root: String, key: String)
      : Option[Long] =
    floorC(confOf(spark), root, key)

  def floorC(conf: Configuration, root: String, key: String)
      : Option[Long] = {
    val pins = liveC(conf, root).flatMap(_._2.get(key)).map(_.toLong)
    if (pins.isEmpty) None else Some(pins.min)
  }
}
