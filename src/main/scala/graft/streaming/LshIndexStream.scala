package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming maintenance of the q276 banded-signature index
  * (round-16 advice #7): the batch merge path
  * (LshIndexQueries.mergedIndex) is proven; this wires the SAME
  * signature kernel through foreachBatch so an arriving micro-batch
  * of documents folds into the maintained index with EXACTLY-ONCE
  * semantics — history batches are never re-shingled, and a crashed
  * batch that foreachBatch redelivers lands idempotently.
  *
  * Exactly-once recipe (the standard idempotent-sink discipline, and
  * the reason the artifact is laid out per batch): foreachBatch gives
  * at-least-once delivery with a STABLE batchId, so each batch's
  * signature rows are published with mode=overwrite into
  * `{idxDir}/batch={batchId}/` — a replay of batch N overwrites
  * batch N's own directory instead of appending duplicates, and
  * every other batch's rows are untouched. The live index is the
  * union of the batch directories (partition-discovered read).
  * StreamingLshIndexSpec proves: (a) across checkpointed restarts
  * the index equals the batch-built signatures of the full corpus,
  * (b) a redelivered batch is a no-op, (c) signatures are computed
  * once per batch — never over history.
  *
  * A signature row depends only on its own document (the q276
  * merge-equivalence fact), so per-batch publication IS the index
  * merge — no read-modify-write on the standing artifact, which is
  * what makes the sink idempotent without a transaction log. */
object LshIndexStream {

  /** Visible-for-test batch counter: proves history is never
    * re-signed (one increment per delivered batch, replays included —
    * the spec asserts the INDEX stays fixed under replay while the
    * counter moves, i.e. idempotency comes from the sink layout, not
    * from skipped work). */
  private[streaming] val batchCount =
    new java.util.concurrent.atomic.AtomicLong

  /** Idempotent per-batch merge: signatures of THIS batch only,
    * overwrite-published under the batch's stable id. Batches may
    * carry an `op` column (CDC, op ∈ {I, D}): insert rows sign as
    * usual; delete rows publish doc_id TOMBSTONES under the
    * underscore-hidden `_tombs/batch=N` sidecar (invisible to the
    * parent partition-discovery read), also overwrite-idempotent.
    * Signatures are per-doc-pure, so retraction needs no component
    * algebra — the read side anti-joins (round-18 advice #2; the
    * ClusterIndexStream op∈{I,D} discipline, minus the versioned
    * state a read-modify-write artifact needs). */
  private[streaming] def mergeBatch(idxDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    batchCount.incrementAndGet()
    val hasOp = batch.columns.contains("op")
    val ins =
      if (hasOp) batch.filter(col("op").isNull || col("op") === "I")
        .select(col("doc_id"), col("text"))
      else batch
    graft.operators.LshIndexQueries.signatures(ins)
      .write.mode("overwrite").parquet(s"$idxDir/batch=$batchId")
    if (hasOp)
      batch.filter(col("op") === "D").select(col("doc_id")).distinct()
        .write.mode("overwrite").parquet(s"$idxDir/_tombs/batch=$batchId")
    ()
  }

  /** Maintain the index at `idxDir` from a documents directory
    * stream; AvailableNow drains what exists and stops (the S3/q43
    * harness discipline). */
  def start(spark: SparkSession, srcDir: String, idxDir: String,
      checkpoint: String): StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(idxDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** CDC variant of [[start]]: rows carry op ∈ {I, D}. Deletes
    * tombstone doc_ids; the live index hides every signature row the
    * newest covering tombstone retracts (see [[index]]). */
  def startCdc(spark: SparkSession, srcDir: String, idxDir: String,
      checkpoint: String): StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, text STRING, op STRING")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(idxDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  private def listDirs(path: String, prefix: String) =
    Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))

  /** Complete compaction bases, ascending by their upTo batch id. */
  private def bases(idxDir: String): Seq[Long] =
    listDirs(idxDir, "_base=")
      .filter(MarkerProtocol.isComplete)
      .map(_.getName.stripPrefix("_base=").toLong).toSeq.sorted

  /** Live rows with their publication batch id: the newest complete
    * compaction base (rows carry batch = upTo — a tombstone NEWER
    * than the base still kills them; everything ≤ upTo was already
    * applied when the base was cut) ∪ the batch publications newer
    * than it, minus the sidecar's retractions. A pinned view
    * ([[indexAt]]) passes an explicit (base, maxBatch) world instead
    * of resolving the newest one. */
  private def liveRows(spark: SparkSession, idxDir: String,
      pinBase: Option[Option[Long]] = None,
      maxBatch: Long = Long.MaxValue): DataFrame = {
    val base = pinBase.getOrElse(bases(idxDir).lastOption)
    val floor = base.getOrElse(Long.MinValue)
    val dirs = listDirs(idxDir, "batch=")
      .filter { f =>
        val v = f.getName.stripPrefix("batch=").toLong
        v > floor && v <= maxBatch
      }
      .map(_.getPath)
    val batchRows =
      if (dirs.isEmpty) None
      else Some(spark.read.option("basePath", idxDir)
        .parquet(dirs.toIndexedSeq: _*)
        .select(col("doc_id"), col("h"), col("band_idx"), col("bh"),
          col("batch").cast(LongType).as("batch")))
    val baseRows = base.map(u =>
      spark.read.parquet(s"$idxDir/_base=$u")
        .select(col("doc_id"), col("h"), col("band_idx"), col("bh"),
          lit(u).as("batch")))
    val rows = (baseRows ++ batchRows).reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("h", StringType),
          StructField("band_idx", LongType),
          StructField("bh", StringType),
          StructField("batch", LongType)))))
    TombstoneSidecar.apply(rows,
      TombstoneSidecar.newestUpTo(spark, idxDir, "doc_id", maxBatch))
  }

  /** The live index: newest compaction base ∪ newer batch
    * publications, minus everything the tombstone sidecar retracts. */
  def index(spark: SparkSession, idxDir: String): DataFrame =
    liveRows(spark, idxDir).select("doc_id", "h", "band_idx", "bh")

  /** This index's version tokens for a [[SnapshotManifest]] pin:
    * `lsh.max_batch` (the newest published batch) and `lsh.base`
    * (the newest complete compaction base, when one exists). An
    * index with no publications at all pins only its emptiness
    * (`lsh.max_batch=-1`). */
  def pin(idxDir: String): Map[String, String] = {
    val maxBatch = listDirs(idxDir, "batch=")
      .map(_.getName.stripPrefix("batch=").toLong).sorted.lastOption
    val base = bases(idxDir).lastOption
    Map("lsh.max_batch" ->
      maxBatch.orElse(base).getOrElse(-1L).toString) ++
      base.map(b => "lsh.base" -> b.toString)
  }

  /** Publish a snapshot manifest pinning this index's current
    * version under `manifestRoot` (default: the index dir itself).
    * Returns the manifest id a reader passes to [[indexAt]]. */
  def publishSnapshot(spark: SparkSession, idxDir: String,
      manifestRoot: Option[String] = None): Long =
    SnapshotManifest.publish(spark, manifestRoot.getOrElse(idxDir),
      pin(idxDir))

  /** The index AS OF manifest `id`: resolves (base, max_batch)
    * through the pinned manifest instead of the newest dirs, so a
    * long-running reader is immune to concurrent folds AND — because
    * [[compact]]'s GC floors at the oldest live manifest — to
    * concurrent compaction reclaiming its input dirs. */
  def indexAt(spark: SparkSession, idxDir: String, id: Long,
      manifestRoot: Option[String] = None): DataFrame = {
    val pins = SnapshotManifest
      .read(spark, manifestRoot.getOrElse(idxDir), id)
      .getOrElse(throw new IllegalArgumentException(
        s"no complete snapshot manifest=$id under " +
          manifestRoot.getOrElse(idxDir)))
    liveRows(spark, idxDir,
      pinBase = Some(pins.get("lsh.base").map(_.toLong)),
      maxBatch = pins.get("lsh.max_batch").map(_.toLong)
        .getOrElse(Long.MaxValue))
      .select("doc_id", "h", "band_idx", "bh")
  }

  /** COMPACTION — the maintenance pass a deployment runs when
    * tombstones and dead batch dirs accumulate: materialize the live
    * index as of the newest published batch into a write-once
    * `_base=<upTo>` snapshot (tmp + _GRAFT_OK + rename — the marker
    * protocol; crash debris is marker-less and invisible), then
    * garbage-collect everything the base supersedes — batch dirs and
    * tombstone dirs ≤ upTo, and older bases. Underscore-prefixed, so
    * the parent partition-discovery read never sees it. Idempotent:
    * a re-run with no newer batches hits the marker check and only
    * re-runs the (safe-anytime) GC; a redelivered pre-compaction
    * batch republishes its dir, which readers ignore (its id is ≤
    * the base's upTo) and the next compaction GC removes. Returns
    * the base's upTo id, or None when there is nothing to compact.
    * GC honors the retention floor of the live [[SnapshotManifest]]s
    * at `manifestRoot` (default: this index dir) — a deployment
    * keeping one cross-artifact manifest root passes it here. */
  def compact(spark: SparkSession, idxDir: String,
      manifestRoot: Option[String] = None): Option[Long] = {
    val newest = listDirs(idxDir, "batch=")
      .map(_.getName.stripPrefix("batch=").toLong).sorted.lastOption
    val upTo = newest.orElse(bases(idxDir).lastOption)
      .getOrElse(return None)
    // write-once through the shared marker protocol: a concurrent or
    // replayed compaction collapses to one winner
    MarkerProtocol.publish(spark, s"$idxDir/_base=$upTo",
      overwrite = false) { tmp =>
      liveRows(spark, idxDir)
        .select(col("doc_id"), col("h"), col("band_idx"), col("bh"))
        .write.parquet(tmp.toString)
      true
    }
    // GC: everything a complete base supersedes — safe anytime after
    // the marker exists — BOUNDED BELOW by the retention floor of the
    // live snapshot manifests (round-19 verdict #1, VACUUM-style
    // grace): a reader pinned to manifest M resolves base/batches/
    // tombstones M recorded, so nothing a live manifest pins is
    // reclaimed until the manifest is dropped. A manifest pinned
    // BEFORE any compaction (no lsh.base) floors at -1 — it reads
    // the raw batch dirs from 0, so none may go. With no live
    // manifests the floor is absent and reclaim is immediate.
    val root = manifestRoot.getOrElse(idxDir)
    val lshPins = SnapshotManifest.live(spark, root).map(_._2)
      .filter(_.keys.exists(_.startsWith("lsh.")))
    val floorB = lshPins
      .map(_.get("lsh.base").map(_.toLong).getOrElse(-1L))
      .minOption
    val delUpTo = floorB.fold(upTo)(math.min(upTo, _))
    val baseKeep = lshPins.flatMap(_.get("lsh.base").map(_.toLong))
      .minOption.fold(upTo)(math.min(upTo, _))
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rmAll(fsn: java.io.File): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(fsn.getPath), true)
    listDirs(idxDir, "batch=")
      .filter(_.getName.stripPrefix("batch=").toLong <= delUpTo)
      .foreach(rmAll)
    listDirs(s"$idxDir/_tombs", "batch=")
      .filter(_.getName.stripPrefix("batch=").toLong <= delUpTo)
      .foreach(rmAll)
    listDirs(idxDir, "_base=")
      .filter(_.getName.stripPrefix("_base=").toLong < baseKeep)
      .foreach(rmAll)
    Some(upTo)
  }
}

/** The tombstone sidecar shared by the per-row-pure maintained
  * indexes (LshIndexStream signatures, IvfIndexStream assignments;
  * round-18 advice #2): CDC deletes publish (id) rows under the
  * underscore-hidden `{idxDir}/_tombs/batch=N` — invisible to the
  * parent partition-discovery read, overwrite-idempotent under
  * redelivery exactly like the data batches — and the read side
  * hides every data row whose id has a tombstone in a batch ≥ the
  * row's own. MAX per id is the whole retraction state: a tombstone
  * at T retracts rows from every batch ≤ T (same-batch I+D is
  * end-of-batch-snapshot — delete wins), and a RE-INSERT in a later
  * batch survives on its larger batch id alone. No component
  * algebra, no versioned state: per-row-pure artifacts compose
  * retraction from an equi-join + filter (a plain hash join at
  * scale, never pairwise). */
private[streaming] object TombstoneSidecar {

  /** Per-id newest tombstone batch (id, maxt) — empty frame when no
    * CDC delete has ever published. */
  def newest(spark: SparkSession, idxDir: String,
      idCol: String): DataFrame =
    newestUpTo(spark, idxDir, idCol, Long.MaxValue)

  /** [[newest]] restricted to tombstones from batches ≤ `maxBatch` —
    * for AS-OF views (IvfIndexStream's drift cut must be a pure
    * function of the lake up to the delivered batch, so a redelivery
    * recomputes the same decision). */
  def newestUpTo(spark: SparkSession, idxDir: String,
      idCol: String, maxBatch: Long): DataFrame = {
    val dirs = Option(new java.io.File(s"$idxDir/_tombs").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
        f.getName.stripPrefix("batch=").toLong <= maxBatch)
      .map(_.getPath)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, LongType),
          StructField("maxt", LongType))))
    else spark.read.option("basePath", s"$idxDir/_tombs")
      .parquet(dirs.toIndexedSeq: _*)
      .groupBy(col(idCol))
      .agg(max(col("batch").cast(LongType)).as("maxt"))
  }

  /** Read-side retraction: keep each row of `rows` (which must carry
    * its publication `batch` and the tombstone frame's id column)
    * unless a tombstone covers its batch. */
  def apply(rows: DataFrame, tombs: DataFrame): DataFrame = {
    val idCol = tombs.columns.head
    rows.join(tombs, Seq(idCol), "left")
      .filter(col("maxt").isNull ||
        col("batch").cast(LongType) > col("maxt"))
      .drop("maxt")
  }
}
