package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.TextOps
import graft.operators.ClusterIndexQueries

/** Streaming maintenance of the q284 cluster-label artifact: each
  * micro-batch of documents folds into the standing (signatures,
  * labels) state through the SAME [[ClusterIndexQueries.mergeCore]]
  * the batch shard merge runs — only the batch's new contents are
  * shingled, only the candidate contact set of old contents is
  * re-shingled (fetched back from the accumulated source lake by
  * content hash), and only touched components re-label.
  *
  * Exactly-once: unlike the per-doc-pure q276 signatures
  * (LshIndexStream, where per-batch OVERWRITE publication suffices),
  * labels are a READ-MODIFY-WRITE over prior state — so the state is
  * VERSIONED BY BATCH ID: state(N) is computed from state(N−1) and
  * published with mode=overwrite under `{stateDir}/batch=N/{sigs,
  * labels}`. A crash-redelivery of batch N re-reads the untouched
  * state(N−1) and overwrites its own version directory — idempotent
  * with no transaction log, because foreachBatch batchIds are stable
  * and dense from one checkpoint. StreamingClusterIndexSpec proves
  * streamed labels ≡ ClusterIndexQueries.fromScratchLabels of the
  * accumulated corpus across checkpointed restarts, and that a
  * redelivered batch is a no-op.
  */
object ClusterIndexStream {

  private def emptySigs(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("h", StringType),
        StructField("band_idx", LongType),
        StructField("bh", StringType))))

  private def emptyLabels(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("h", StringType),
        StructField("lbl", StringType))))

  private def readState(s: SparkSession, stateDir: String,
      batchId: Long): (DataFrame, DataFrame) =
    if (batchId < 0) (emptySigs(s), emptyLabels(s))
    else (s.read.parquet(s"$stateDir/batch=$batchId/sigs"),
      s.read.parquet(s"$stateDir/batch=$batchId/labels"))

  /** Content groups (h, sh, n) of a raw (doc_id, text) frame — the
    * q284 grain, no corpus planting (streams carry real docs). */
  private def groupsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("nt", TextOps.norm(col("text")))
      .filter(col("nt").isNotNull)
      .select(md5(col("nt")).as("h"), col("nt"))
      .repartition(col("h"))
      .groupBy(col("h")).agg(min(col("nt")).as("nt"))
      .withColumn("sh", TextOps.shingleSet(split(col("nt"), " "), 5))
      .withColumn("n", size(col("sh")).cast(LongType))
      .drop("nt")

  /** Fold one delivered batch into versioned state — idempotent under
    * redelivery of the same batchId. `srcDir` is the accumulated
    * source lake, read back ONLY for the candidate contact set. */
  private[streaming] def mergeBatch(srcDir: String, stateDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val (oldSigs, oldLabels) = readState(s, stateDir, batchId - 1)
    val (sigs, labels) = ClusterIndexQueries.mergeCore(
      oldSigs.localCheckpoint(), oldLabels.localCheckpoint(),
      groupsOf(batch),
      candH => groupsOf(s.read.parquet(srcDir))
        .join(candH, Seq("h"), "left_semi"))
    sigs.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId/sigs")
    labels.write.mode("overwrite")
      .parquet(s"$stateDir/batch=$batchId/labels")
    ()
  }

  def start(spark: SparkSession, srcDir: String, stateDir: String,
      checkpoint: String): StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(srcDir, stateDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** State retention (the q285 checkpoint-truncate contract, applied
    * to the versioned stream state): drop all versions older than the
    * newest `keep`. Safe floor is keep = 2 — the latest version
    * serves reads, and a crash-redelivery of the latest batchId needs
    * its PREDECESSOR intact; anything older is only history.
    * StreamingClusterIndexSpec proves reads and redelivery survive a
    * prune to that floor. */
  def pruneVersions(stateDir: String, keep: Int = 2): Unit = {
    val d = new java.io.File(stateDir)
    val versions = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .sortBy(_.getName.stripPrefix("batch=").toLong)
    versions.dropRight(keep.max(2)).foreach { f =>
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(f)
    }
  }

  /** The live labels: the HIGHEST published batch version. */
  def labels(spark: SparkSession, stateDir: String): DataFrame = {
    val d = new java.io.File(stateDir)
    val latest = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong)
      .sorted.lastOption
    latest match {
      case Some(b) => spark.read.parquet(s"$stateDir/batch=$b/labels")
      case None => emptyLabels(spark)
    }
  }
}
