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
  * directories. Publications store the VECTOR alongside the
  * assignment (standard IVF posting practice) — that is what makes a
  * retrain self-contained from the index itself, with no lake
  * refetch and no re-insert ambiguity.
  *
  * Generation-0 centroids are part of the artifact: trained
  * (deterministic hash-ordered selection, q265's kernel) from the
  * FIRST delivered non-empty batch and published write-once through
  * the tmp+_GRAFT_OK+rename lifecycle. A crash-redelivery of that
  * batch recomputes the SAME centroid set (pure function of the
  * batch) and the marker check makes the republish race-free; later
  * batches only read.
  *
  * CDC batches (op ∈ {I, D}) retract per-row-purely through the
  * shared [[TombstoneSidecar]] — see LshIndexStream.
  *
  * DRIFT-TRIGGERED RETRAIN (round-18 advice/VERDICT #3, the q295
  * decision as a streaming fold): after folding batch N, the current
  * generation's live occupancy is checked; if the hottest cell
  * exceeds 1.5× the mean (the q295 cut, integer micro-units),
  * generation G+1 trains on the live rows' vectors (same
  * deterministic kernel), re-assigns them as a BASE snapshot, and
  * publishes the whole generation write-once under the
  * underscore-hidden `{idxDir}/_gen=G+1/` (centroids + base +
  * cover=N marker + _GRAFT_OK, one rename). Assignments carry their
  * generation positionally: batch M folds under the NEWEST COMPLETE
  * generation whose cover < M, which is what makes the bump
  * idempotent — a redelivered batch N re-selects its ORIGINAL
  * generation (cover ≥ N excludes the bumped one), re-publishes its
  * own directory, and the already-complete `_gen=G+1` publish is
  * skipped by the marker check. Reads serve the newest complete
  * generation: base (carrying batch = cover, so later tombstones
  * still kill its rows) ∪ the generation's own batches.
  *
  * StreamingIvfSpec proves: streamed index ≡ batch-built assignment
  * of the accumulated corpus across checkpointed restarts; a
  * redelivered batch is a no-op; centroids train once per
  * generation; CDC deletes retract across generations; a drift bump
  * is exactly-once under redelivery.
  */
object IvfIndexStream {

  private val nCells = 32

  /** The q295 cut: retrain when max cell occupancy ≥ 1.5× mean
    * (integer micro-units — max_n * nCellsTrained * 1e6 div total).
    * Overridable per stream (Long.MaxValue disables retrain — the
    * pure frozen-centroid q265 contract). */
  private[streaming] val defaultDriftThresholdU = 1500000L

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
    * first `nCells` vectors of the training frame. The training frame
    * must carry (vec_id, v). */
  private def selectFrom(df: DataFrame): DataFrame =
    df.orderBy(md5(col("vec_id").cast(StringType).cast(BinaryType)),
        col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  private[streaming] def selectCentroids(df: DataFrame): DataFrame =
    selectFrom(vecs(df))

  /** Nearest-centroid assignment (max cosine, min cid tiebreak) over
    * a (vec_id, v) frame — one broadcast-centroid scoring pass, the
    * q59/q265 shape. Output keeps the vector (v) so the index is
    * retrain-self-contained. The struct max is deterministic: ncid is
    * unique within a (vec_id) group, so v (last field) never decides
    * the ordering. */
  private def assignVecs(cents: DataFrame, df: DataFrame): DataFrame =
    df.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), col("v"),
        cosine(col("v"), col("cv")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"),
        (lit(0L) - col("cid")).as("ncid"), col("v"))).as("best"))
      .select(col("vec_id"),
        (lit(0L) - col("best.ncid")).as("cell"),
        round(col("best.csim"), 6).as("csim"),
        col("best.v").as("v"))

  private[streaming] def assignTo(cents: DataFrame,
      df: DataFrame): DataFrame =
    assignVecs(cents, vecs(df))

  private def centroidsPath(idxDir: String) = s"$idxDir/centroids"

  /** Load generation-0 centroids; train-and-publish write-once from
    * `trainFrom` if absent (tmp+marker+rename — concurrent/replayed
    * publishers collapse to one winner; losers read the winner's
    * copy, which is identical because selection is a pure function of
    * the batch). The caller guarantees `trainFrom` is NON-EMPTY
    * (round-18 advice: an empty batch 0 must NOT freeze an empty
    * centroid set forever — mergeBatch defers training to the first
    * non-empty batch); a training frame smaller than nCells still
    * publishes (assignment to the nearest of what exists is
    * well-defined) but is logged, because an undersized cell count
    * degrades recall at scale. */
  private[streaming] def centroids(s: SparkSession, idxDir: String,
      trainFrom: => DataFrame): DataFrame = {
    // write-once through the shared marker protocol (the trainFrom
    // thunk is only forced when no complete centroid set exists)
    MarkerProtocol.publish(s, centroidsPath(idxDir),
      overwrite = false) { tmp =>
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
      picked.write.parquet(tmp.toString)
      true
    }
    // _GRAFT_OK is underscore-prefixed, which Spark's file index
    // treats as hidden — the plain read skips it
    s.read.parquet(centroidsPath(idxDir)).select(col("cid"), col("cv"))
  }

  // ------------------------------------------------------------------
  // centroid generations (drift-triggered retrain)
  // ------------------------------------------------------------------

  private def listDirs(path: String, prefix: String): Array[java.io.File] =
    Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))

  private def isComplete(f: java.io.File): Boolean =
    MarkerProtocol.isComplete(f)

  /** Complete generations, ascending: (gen, cover). Generation 0 (the
    * legacy layout at the idxDir root) is implicit with cover = -1
    * and is NOT listed here. */
  private[streaming] def generations(idxDir: String): Seq[(Long, Long)] =
    listDirs(idxDir, "_gen=").filter(isComplete).toSeq
      .map { f =>
        val g = f.getName.stripPrefix("_gen=").toLong
        val cover = Option(f.listFiles()).getOrElse(Array.empty)
          .map(_.getName).find(_.startsWith("cover="))
          .map(_.stripPrefix("cover=").toLong)
          .getOrElse(sys.error(s"generation dir ${f.getPath} has no cover"))
        (g, cover)
      }
      .sortBy(_._1)

  /** The generation a given batch folds under: the newest COMPLETE
    * generation whose base covers strictly OLDER batches (cover <
    * batchId) — so a redelivered batch re-selects its original
    * generation even after a later bump. Returns (gen, batchRoot,
    * centroidsPath); gen 0 is the legacy root layout. */
  private def genFor(idxDir: String, batchId: Long)
      : (Long, String, String) =
    generations(idxDir).filter(_._2 < batchId).lastOption match {
      case Some((g, _)) =>
        (g, s"$idxDir/_gen=$g", s"$idxDir/_gen=$g/centroids")
      case None => (0L, idxDir, centroidsPath(idxDir))
    }

  /** The newest complete generation for READS (no batch restriction). */
  private def newestGen(idxDir: String): Option[(Long, Long)] =
    generations(idxDir).lastOption

  private def batchDirsUnder(root: String): Array[String] =
    listDirs(root, "batch=").map(_.getPath)

  /** Live rows (vec_id, cell, csim, v, batch) of one generation as of
    * `maxBatch` (Long.MaxValue = now): base snapshot (batch = cover —
    * tombstones newer than the cover still kill its rows) ∪ the
    * generation's own batch publications, minus tombstones up to
    * `maxBatch`. */
  private def genView(spark: SparkSession, idxDir: String, gen: Long,
      cover: Long, maxBatch: Long): DataFrame = {
    val root = if (gen == 0L) idxDir else s"$idxDir/_gen=$gen"
    val dirs = batchDirsUnder(root)
      .filter(_.split("batch=").last.toLong <= maxBatch)
    val batchRows =
      if (dirs.isEmpty) None
      else Some(spark.read.option("basePath", root)
        .parquet(dirs.toIndexedSeq: _*)
        .select(col("vec_id"), col("cell"), col("csim"), col("v"),
          col("batch").cast(LongType).as("batch")))
    val baseRows =
      if (gen == 0L) None
      else Some(spark.read.parquet(s"$idxDir/_gen=$gen/base")
        .select(col("vec_id"), col("cell"), col("csim"), col("v"),
          lit(cover).as("batch")))
    (baseRows ++ batchRows).reduceOption(_.unionByName(_)) match {
      case None => emptyIndex(spark)
      case Some(rows) =>
        TombstoneSidecar.apply(rows,
          TombstoneSidecar.newestUpTo(spark, idxDir, "vec_id", maxBatch))
    }
  }

  /** The q295 drift cut over a live view's occupancy — one scalar
    * pull (the q265 "1-row argmax" discipline). `nCellsTrained` is
    * the generation's trained centroid count (q295 uses the same),
    * so empty cells COUNT toward the mean — a hot cell among mostly
    * empty ones is exactly the drift signal. A deployment that
    * cannot afford the per-batch occupancy scan would maintain the
    * per-cell counters as running state; the scan here reads only
    * (vec_id, cell, batch) — column-pruned off the posting files. */
  private def skewU(view: DataFrame, nCellsTrained: Long): Long =
    view.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(expr(s"(max(n) * $nCellsTrained * 1000000) div sum(n)"))
      .head() match {
        case r if r.isNullAt(0) => 0L // empty view
        case r => r.getLong(0)
      }

  /** Write-once generation bump: train gen+1 on the live view's own
    * vectors (the index stores them — self-contained), re-assign them
    * as the base snapshot, publish atomically with the cover id. A
    * concurrent/replayed publisher hits the marker check and skips. */
  private def bumpGeneration(spark: SparkSession, idxDir: String,
      fromGen: Long, cover: Long, view: DataFrame): Unit = {
    val g1 = fromGen + 1
    // write-once through the shared marker protocol; the callback
    // aborts (false) when the retrain frame is empty — nothing to
    // train on, keep the current generation
    MarkerProtocol.publish(spark, s"$idxDir/_gen=$g1",
      overwrite = false) { tmp =>
      val live = view.select(col("vec_id"), col("v")).localCheckpoint()
      val cents = selectFrom(live).localCheckpoint()
      if (cents.isEmpty) false
      else {
        val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        cents.write.parquet(s"$tmp/centroids")
        assignVecs(cents, live).write.parquet(s"$tmp/base")
        fs.create(new org.apache.hadoop.fs.Path(tmp, s"cover=$cover"),
          true).close()
        true
      }
    }
    ()
  }

  /** Idempotent per-batch fold: assignments of THIS batch only,
    * overwrite-published under the batch's stable id, under the
    * generation the batch belongs to. An EMPTY insert set publishes
    * no batch directory — in particular it never trains centroids
    * (round-18 advice: a stream started before the lake has data must
    * not freeze an empty/degenerate centroid set). After the fold,
    * the drift cut runs on the generation's live view AS OF this
    * batch (deterministic under redelivery) and may bump a
    * generation, write-once. */
  private[streaming] def mergeBatch(idxDir: String,
      thresholdU: Long = defaultDriftThresholdU)(
      batch: DataFrame, batchId: Long): Unit = {
    batchCount.incrementAndGet()
    val s = batch.sparkSession
    val hasOp = batch.columns.contains("op")
    val b = vecs(if (hasOp)
        batch.filter(col("op").isNull || col("op") === "I")
          .select(col("vec_id"), col("embedding"))
      else batch).localCheckpoint()
    val (gen, root, centsPath) = genFor(idxDir, batchId)
    if (!b.isEmpty) {
      val cents =
        if (gen == 0L)
          centroids(s, idxDir, b.select(col("vec_id"),
            col("v").as("embedding")))
        else s.read.parquet(centsPath).select(col("cid"), col("cv"))
      assignVecs(cents, b)
        .write.mode("overwrite").parquet(s"$root/batch=$batchId")
    }
    // CDC deletes: vec_id tombstones to the shared sidecar — an
    // assignment row depends only on its own vector (frozen
    // centroids), so retraction is read-side per-row-pure exactly
    // like the LSH signatures (round-18 advice #2)
    if (hasOp)
      batch.filter(col("op") === "D").select(col("vec_id")).distinct()
        .write.mode("overwrite").parquet(s"$idxDir/_tombs/batch=$batchId")
    // drift cut on this generation's live view as of THIS batch —
    // pure function of (lake ≤ batchId), so a redelivery recomputes
    // the same decision and the write-once publish makes it a no-op
    if (thresholdU < Long.MaxValue) {
      val cover = if (gen == 0L) -1L
        else generations(idxDir).find(_._1 == gen).map(_._2)
          .getOrElse(-1L)
      val view = genView(s, idxDir, gen, cover, batchId)
      if (!view.isEmpty) {
        val nCellsTrained = s.read.parquet(centsPath).count()
        if (skewU(view, nCellsTrained) >= thresholdU)
          bumpGeneration(s, idxDir, gen, batchId, view)
      }
    }
    ()
  }

  def start(spark: SparkSession, srcDir: String, idxDir: String,
      checkpoint: String,
      driftThresholdU: Long = defaultDriftThresholdU): StreamingQuery =
    spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label LONG")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(idxDir, driftThresholdU) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** CDC variant of [[start]]: rows carry op ∈ {I, D}. Deletes
    * tombstone vec_ids via the shared [[TombstoneSidecar]]; the live
    * index hides every assignment row the newest covering tombstone
    * retracts. */
  def startCdc(spark: SparkSession, srcDir: String, idxDir: String,
      checkpoint: String,
      driftThresholdU: Long = defaultDriftThresholdU): StreamingQuery =
    spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, op STRING")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(mergeBatch(idxDir, driftThresholdU) _)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  private def emptyIndex(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("cell", LongType),
        StructField("csim", DoubleType),
        StructField("v", ArrayType(DoubleType)),
        StructField("batch", LongType))))

  /** The live index (vec_id, cell, csim): the newest complete
    * generation's base ∪ its batches, minus the tombstone sidecar's
    * retractions; empty before any batch has published (round-18
    * advice; mirrors ClusterIndexStream.labels' empty-state
    * handling). */
  def index(spark: SparkSession, idxDir: String): DataFrame = {
    val view = newestGen(idxDir) match {
      case Some((g, cover)) =>
        genView(spark, idxDir, g, cover, Long.MaxValue)
      case None => genView(spark, idxDir, 0L, -1L, Long.MaxValue)
    }
    view.select("vec_id", "cell", "csim")
  }

  /** The live generation id (0 until the first drift bump). */
  def liveGeneration(idxDir: String): Long =
    newestGen(idxDir).map(_._1).getOrElse(0L)

  /** GC — the compaction analog for the generation layout (a bump
    * already consolidates the live rows into its base snapshot, so
    * unlike LshIndexStream no separate base cut is needed): reclaim
    * every source the newest COMPLETE generation supersedes — older
    * `_gen=G` dirs wholesale, root (gen-0) batch dirs with id ≤ the
    * newest cover, tombstones ≤ the newest cover (they were applied
    * when that base was cut; base rows carry batch = cover, so only
    * NEWER tombstones can still retract), and crash-debris tmp dirs
    * for already-complete generations. Safe anytime after the
    * newest marker exists: readers already ignore all of it, and a
    * redelivered pre-bump batch merely republishes a root dir
    * readers skip (its id ≤ cover) — the next GC sweeps it. Gen-0
    * centroids stay (a pre-bump redelivery re-reads them). No-op
    * before the first bump.
    *
    * Retention (round-19 verdict #1): bounded below by the live
    * [[SnapshotManifest]]s at `manifestRoot` (default: this index
    * dir). A manifest pinning `ivf.gen=G` keeps generation G's dirs
    * — its `_gen=G` tree (or, for G=0, the root batch dirs) and the
    * tombstones newer than G's cover — until the manifest drops. */
  def gc(idxDir: String,
      manifestRoot: Option[String] = None): Unit =
    newestGen(idxDir) match {
    case None => ()
    case Some((g, cover)) =>
      val pins = SnapshotManifest.liveC(
        new org.apache.hadoop.conf.Configuration(),
        manifestRoot.getOrElse(idxDir)).map(_._2)
        .filter(_.keys.exists(_.startsWith("ivf.")))
      // floor generation: a manifest pinning ivf without a gen token
      // pinned the pre-bump world (gen 0)
      val floorGen = pins
        .map(_.get("ivf.gen").map(_.toLong).getOrElse(0L))
        .minOption
      val keepGen = floorGen.fold(g)(math.min(g, _))
      // the floor generation's cover bounds batch/tombstone reclaim:
      // gen 0 covers nothing (-1), so a gen-0 pin keeps everything
      val floorCover =
        if (keepGen == g) cover
        else if (keepGen == 0L) -1L
        else generations(idxDir).find(_._1 == keepGen).map(_._2)
          .getOrElse(-1L)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      listDirs(idxDir, "_gen=")
        .filter(_.getName.stripPrefix("_gen=").toLong < keepGen)
        .foreach(rm)
      listDirs(idxDir, "batch=")
        .filter(_.getName.stripPrefix("batch=").toLong <= floorCover)
        .foreach(rm)
      listDirs(s"$idxDir/_tombs", "batch=")
        .filter(_.getName.stripPrefix("batch=").toLong <= floorCover)
        .foreach(rm)
      listDirs(idxDir, ".tmp-_gen=")
        .filter(f => f.getName.stripPrefix(".tmp-_gen=")
          .takeWhile(_ != '-').toLong <= g)
        .foreach(rm)
  }

  /** This index's version tokens for a [[SnapshotManifest]] pin:
    * `ivf.gen` (live generation) and `ivf.max_batch` (the newest
    * batch published under it). */
  def pin(idxDir: String): Map[String, String] = {
    val (g, root) = newestGen(idxDir) match {
      case Some((gg, _)) => (gg, s"$idxDir/_gen=$gg")
      case None => (0L, idxDir)
    }
    val maxBatch = batchDirsUnder(root)
      .map(_.split("batch=").last.toLong).sorted.lastOption
      .getOrElse(-1L)
    Map("ivf.gen" -> g.toString, "ivf.max_batch" -> maxBatch.toString)
  }

  /** The index AS OF manifest `id` (see LshIndexStream.indexAt): the
    * pinned generation's view at the pinned batch frontier — immune
    * to concurrent folds, bumps, and (because [[gc]] floors at the
    * oldest live manifest) to concurrent GC. */
  def indexAt(spark: SparkSession, idxDir: String, id: Long,
      manifestRoot: Option[String] = None): DataFrame = {
    val pins = SnapshotManifest
      .read(spark, manifestRoot.getOrElse(idxDir), id)
      .getOrElse(throw new IllegalArgumentException(
        s"no complete snapshot manifest=$id under " +
          manifestRoot.getOrElse(idxDir)))
    val g = pins.get("ivf.gen").map(_.toLong).getOrElse(0L)
    val cover =
      if (g == 0L) -1L
      else generations(idxDir).find(_._1 == g).map(_._2)
        .getOrElse(throw new IllegalStateException(
          s"manifest=$id pins ivf.gen=$g but the generation is gone — " +
            "was GC run against a different manifest root?"))
    val maxBatch = pins.get("ivf.max_batch").map(_.toLong)
      .getOrElse(Long.MaxValue)
    genView(spark, idxDir, g, cover, maxBatch)
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
