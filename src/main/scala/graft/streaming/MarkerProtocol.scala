package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** THE atomic-publish sequence shared by every maintained-artifact
  * writer (round-19 advice #6: ClusterIndexStream.mergeBatch,
  * LshIndexStream.compact, IvfIndexStream.centroids and
  * .bumpGeneration each hand-rolled this ~4-step FS dance; a fix in
  * one copy would not propagate). One implementation, exercised by
  * the existing crash / prune-race / redelivery specs of all four
  * callers.
  *
  * Sequence: stage everything (parquet parts + any caller-side
  * markers) in a dot-prefixed tmp sibling, drop the `_GRAFT_OK`
  * completeness marker LAST, expose with ONE rename. A crash at any
  * point leaves either the intact predecessor or marker-less debris
  * readers already skip; the next publish of the same target deletes
  * that debris (the target's only legitimate writer is this caller —
  * foreachBatch serializes batch publishes, write-once targets have a
  * single trainer — so same-target tmp leftovers are always crash
  * debris, never a concurrent writer).
  *
  * Two modes:
  *  - `overwrite = true` (versioned-state publish, e.g.
  *    `batch=N`): an existing target — even a COMPLETE one — is
  *    replaced; a redelivered batch N must supersede its own previous
  *    publication. Rename failure throws (state would be lost).
  *  - `overwrite = false` (write-once publish, e.g. `_base=`, `_gen=`,
  *    `centroids`): an existing COMPLETE target wins and the callback
  *    never runs (concurrent/replayed publishers collapse to one
  *    winner; losers read the winner's copy, identical because the
  *    content is a pure function of the inputs). An INCOMPLETE
  *    existing target is crash debris and is replaced.
  *
  * The callback writes the artifact into the tmp dir and returns
  * true to publish; returning false aborts (tmp is deleted, nothing
  * exposed) — for callers that discover mid-write there is nothing
  * to publish (e.g. an empty retrain frame must not bump a
  * generation).
  *
  * @return true iff THIS call's write became the live target.
  */
private[streaming] object MarkerProtocol {

  /** Completeness marker, underscore-prefixed so Spark's file index
    * treats it as hidden — plain parquet reads of the target skip it. */
  val Marker = "_GRAFT_OK"

  def isComplete(f: java.io.File): Boolean =
    new java.io.File(f, Marker).isFile

  /** @param deleteDebris sweep same-target `.tmp-` leftovers on entry.
    *   True for the four single-writer artifact callers (same-target
    *   tmp leftovers are always crash debris there — scaladoc above).
    *   MUST be false for callers that support CONCURRENT publishers
    *   racing on the same target (SnapshotManifest's collapse-to-one-
    *   winner id allocation): a losing publisher entering publish()
    *   would otherwise delete the winner's in-flight tmp, and the
    *   winner's subsequent marker create would resurrect the tmp dir
    *   and rename a COMPLETE target containing only the marker
    *   (round-20 ADVICE #1; SnapshotManifestSpec pins the race). */
  def publish(spark: SparkSession, target: String,
      overwrite: Boolean, deleteDebris: Boolean = true)(
      write: Path => Boolean): Boolean = {
    val base = new Path(target)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ok = new Path(base, Marker)
    if (!overwrite && fs.exists(ok)) return false
    val prefix = s".tmp-${base.getName}-"
    // same-target crash debris (see scaladoc): deletable here, and
    // deleting it here is what keeps debris bounded (round-18 #4)
    if (deleteDebris)
      (try fs.listStatus(base.getParent)
       catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] })
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, true))
    val tmp = new Path(base.getParent,
      prefix + java.util.UUID.randomUUID().toString.take(8))
    if (!write(tmp)) { fs.delete(tmp, true); return false }
    fs.create(new Path(tmp, Marker), true).close()
    // expose: clear whatever the mode says must yield, one rename
    if (fs.exists(base) && (overwrite || !fs.exists(ok)))
      fs.delete(base, true)
    if (fs.exists(base) || !fs.rename(tmp, base)) {
      fs.delete(tmp, true)
      if (overwrite) throw new IllegalStateException(
        s"marker-protocol publish failed for $target")
      false
    } else true
  }
}
