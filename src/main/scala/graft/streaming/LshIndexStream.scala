package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
    * overwrite-published under the batch's stable id. */
  private[streaming] def mergeBatch(idxDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    batchCount.incrementAndGet()
    graft.operators.LshIndexQueries.signatures(batch)
      .write.mode("overwrite").parquet(s"$idxDir/batch=$batchId")
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

  /** The live index: union of the per-batch publications. */
  def index(spark: SparkSession, idxDir: String): DataFrame =
    spark.read.parquet(idxDir)
      .select("doc_id", "h", "band_idx", "bh")
}
