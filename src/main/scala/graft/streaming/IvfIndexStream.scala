package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming maintenance of the q265 IVF shard index (round-17 advice
  * #6) — the last maintained artifact without a streaming fold. A
  * production IVF never re-clusters per shard: centroids FREEZE after
  * training and arriving vectors are only ASSIGNED (q265's contract).
  * Given frozen centroids, a vector's cell assignment depends only on
  * its own embedding — per-doc-pure — so the LshIndexStream
  * discipline applies verbatim: each delivered micro-batch's
  * assignment rows publish with mode=overwrite under the batch's
  * STABLE foreachBatch id (`{idxDir}/batch={id}/`), making
  * at-least-once redelivery idempotent with no read-modify-write and
  * no transaction log. The live index is the union of the batch
  * directories.
  *
  * Centroids are part of the artifact: trained (deterministic
  * hash-ordered selection, q265's kernel) from the FIRST delivered
  * batch and published write-once through the tmp+_GRAFT_OK+rename
  * lifecycle. A crash-redelivery of batch 0 recomputes the SAME
  * centroid set (pure function of the batch) and the marker check
  * makes the republish race-free; later batches only read.
  *
  * StreamingIvfSpec proves: streamed index ≡ batch-built assignment
  * of the accumulated corpus across checkpointed restarts; a
  * redelivered batch is a no-op; centroids train once, ever.
  */
object IvfIndexStream {

  private val nCells = 32

  private[streaming] val batchCount =
    new java.util.concurrent.atomic.AtomicLong

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast(DoubleType))
  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorFunctions.dot(a, b)
  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def vecs(df: DataFrame): DataFrame =
    df.select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Deterministic centroid selection — q265's kernel: hash-ordered
    * first `nCells` vectors of the training frame. */
  private[streaming] def selectCentroids(df: DataFrame): DataFrame =
    vecs(df)
      .orderBy(md5(col("vec_id").cast(StringType).cast(BinaryType)),
        col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** Nearest-centroid assignment (max cosine, min cid tiebreak) —
    * one broadcast-centroid scoring pass, the q59/q265 shape. */
  private[streaming] def assignTo(cents: DataFrame,
      df: DataFrame): DataFrame =
    vecs(df).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cosine(col("v"), col("cv")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"),
        (lit(0L) - col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"),
        (lit(0L) - col("best.ncid")).as("cell"),
        round(col("best.csim"), 6).as("csim"))

  private def centroidsPath(idxDir: String) = s"$idxDir/centroids"

  /** Load centroids; train-and-publish write-once from `trainFrom` if
    * absent (tmp+marker+rename — concurrent/replayed publishers
    * collapse to one winner; losers read the winner's copy, which is
    * identical because selection is a pure function of the batch).
    * The caller guarantees `trainFrom` is NON-EMPTY (round-18 advice:
    * an empty batch 0 must NOT freeze an empty centroid set forever —
    * mergeBatch defers training to the first non-empty batch); a
    * training frame smaller than nCells still publishes (assignment
    * to the nearest of what exists is well-defined) but is logged,
    * because an undersized cell count degrades recall at scale. */
  private[streaming] def centroids(s: SparkSession, idxDir: String,
      trainFrom: => DataFrame): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(centroidsPath(idxDir))
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    val ok = new org.apache.hadoop.fs.Path(base, "_GRAFT_OK")
    if (!fs.exists(ok)) {
      val picked = selectCentroids(trainFrom).localCheckpoint()
      val n = picked.count()
      if (n == 0)
        throw new IllegalStateException(
          "IVF centroid training frame is empty — caller must defer " +
            "training to the first non-empty batch")
      if (n < nCells)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"IVF centroids trained from only $n vectors (< $nCells " +
            "cells) — recall will be degraded until a retrain")
      val tmp = new org.apache.hadoop.fs.Path(
        s"${centroidsPath(idxDir)}.tmp-" +
          java.util.UUID.randomUUID().toString.take(8))
      picked.write.parquet(tmp.toString)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_OK"), true)
        .close()
      if (fs.exists(base) && !fs.exists(ok)) fs.delete(base, true)
      if (fs.exists(base) || !fs.rename(tmp, base)) fs.delete(tmp, true)
    }
    // _GRAFT_OK is underscore-prefixed, which Spark's file index
    // treats as hidden — the plain read skips it
    s.read.parquet(centroidsPath(idxDir)).select(col("cid"), col("cv"))
  }

  /** Idempotent per-batch fold: assignments of THIS batch only,
    * overwrite-published under the batch's stable id. An EMPTY batch
    * publishes nothing — in particular it never trains centroids
    * (round-18 advice: a stream started before the lake has data must
    * not freeze an empty/degenerate centroid set), and the absent
    * batch directory is equivalent to an empty one at read time. */
  private[streaming] def mergeBatch(idxDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    batchCount.incrementAndGet()
    val s = batch.sparkSession
    val hasOp = batch.columns.contains("op")
    val b = (if (hasOp)
        batch.filter(col("op").isNull || col("op") === "I")
          .select(col("vec_id"), col("embedding"))
      else batch).localCheckpoint()
    if (!b.isEmpty) {
      val cents = centroids(s, idxDir, b)
      assignTo(cents, b)
        .write.mode("overwrite").parquet(s"$idxDir/batch=$batchId")
    }
    // CDC deletes: vec_id tombstones to the shared sidecar — an
    // assignment row depends only on its own vector (frozen
    // centroids), so retraction is read-side per-row-pure exactly
    // like the LSH signatures (round-18 advice #2)
    if (hasOp)
      batch.filter(col("op") === "D").select(col("vec_id")).distinct()
        .write.mode("overwrite").parquet(s"$idxDir/_tombs/batch=$batchId")
    ()
  }

  def start(spark: SparkSession, srcDir: String, idxDir: String,
      checkpoint: String): StreamingQuery =
    spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label LONG")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(idxDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** CDC variant of [[start]]: rows carry op ∈ {I, D}. Deletes
    * tombstone vec_ids via the shared [[TombstoneSidecar]]; the live
    * index hides every assignment row the newest covering tombstone
    * retracts. */
  def startCdc(spark: SparkSession, srcDir: String, idxDir: String,
      checkpoint: String): StreamingQuery =
    spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, op STRING")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(idxDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  private def emptyIndex(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("cell", LongType),
        StructField("csim", DoubleType))))

  /** Batch directories that exist under `idxDir` — listed FIRST so a
    * pre-first-publication read returns an empty frame instead of the
    * AnalysisException an unmatched glob throws (round-18 advice;
    * mirrors ClusterIndexStream.labels' empty-state handling). */
  private def batchDirs(idxDir: String): Array[String] =
    Option(new java.io.File(idxDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getPath)

  /** The live index: union of the per-batch publications
    * (vec_id, cell, csim) minus the tombstone sidecar's retractions;
    * empty before any batch has published. */
  def index(spark: SparkSession, idxDir: String): DataFrame = {
    val dirs = batchDirs(idxDir)
    if (dirs.isEmpty) emptyIndex(spark)
    else TombstoneSidecar.apply(
      spark.read
        .option("basePath", idxDir)
        .parquet(dirs.toIndexedSeq: _*)
        .select(col("vec_id"), col("cell"), col("csim"), col("batch")),
      TombstoneSidecar.newest(spark, idxDir, "vec_id"))
      .select("vec_id", "cell", "csim")
  }

  /** Per-cell occupancy off the maintained index — the q265 summary
    * grain, for drift watching. */
  def cells(spark: SparkSession, idxDir: String): DataFrame =
    index(spark, idxDir)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("csim").cast(DecimalType(18, 6)))
          .cast(DoubleType) / count(lit(1)), 6).as("mean_csim"))
      .orderBy(col("cell"))
}
