package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming maintenance of the q276 index (LshIndexStream): across
  * checkpointed restarts the maintained index must equal the
  * batch-built signatures of the full corpus (the q276
  * merge-equivalence, now under streaming delivery), and a
  * redelivered batch (foreachBatch's at-least-once contract after a
  * crash) must land idempotently. */
class StreamingLshIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base =
    "the quick brown fox jumps over the lazy dog again and again"

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "h", "band_idx", "bh").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet

  test("index equals batch-built signatures across restarts; replays are no-ops") {
    import spark.implicits._
    val srcDir = graft.TestTmp.dir("graft_lshstream_src_")
    val idxDir = graft.TestTmp.dir("graft_lshstream_idx_")
    val ckpt = graft.TestTmp.dir("graft_lshstream_ck_")
    // three micro-batches; batch 1 repeats batch-0 content (exact
    // dup arriving later), batch 2 adds a near-dup and a no-shingle doc
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq(20L -> (base + " family zero"),
        21L -> "completely unrelated content number one with many words"),
      Seq(22L -> (base + " family zero"),
        23L -> (base + " family one")),
      Seq(24L -> (base + " family zero variant"),
        25L -> "tiny doc"))
    def writeBatch(b: Seq[(Long, String)]): Unit =
      b.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    // restart-per-batch: each start() resumes from the same
    // checkpoint and drains only the new file
    batches.foreach { b =>
      writeBatch(b)
      LshIndexStream.start(spark, srcDir, idxDir, ckpt)
        .awaitTermination()
    }
    val allDocs = batches.flatten.toDF("doc_id", "text")
    val streamed = rowSet(LshIndexStream.index(spark, idxDir))
    val batchBuilt = rowSet(
      graft.operators.LshIndexQueries.signatures(allDocs))
    assert(streamed == batchBuilt,
      s"diff: ${(streamed.diff(batchBuilt) ++
        batchBuilt.diff(streamed)).take(5)}")
    assert(streamed.nonEmpty)
    // crash-redelivery: foreachBatch may replay a committed batch
    // with the SAME batchId after a failure — simulate it by
    // re-invoking the merge directly; the work re-runs (counter
    // moves) but the index is unchanged (overwrite under the stable
    // batch id), i.e. exactly-once at the artifact
    val before = LshIndexStream.batchCount.get()
    LshIndexStream.mergeBatch(idxDir)(
      batches(1).toDF("doc_id", "text"), 1L)
    assert(LshIndexStream.batchCount.get() == before + 1)
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == batchBuilt,
      "replayed batch changed the index")
    // a FRESH document after the replay still folds in — the replay
    // did not poison the checkpoint lineage
    writeBatch(Seq(26L -> (base + " family one")))
    LshIndexStream.start(spark, srcDir, idxDir, ckpt).awaitTermination()
    val withNew = rowSet(LshIndexStream.index(spark, idxDir))
    val expected = rowSet(graft.operators.LshIndexQueries.signatures(
      (batches.flatten :+ (26L -> (base + " family one")))
        .toDF("doc_id", "text")))
    assert(withNew == expected)
  }

  test("CDC deletes: streamed index equals from-scratch on the net corpus; re-insert after delete survives") {
    import spark.implicits._
    val srcDir = graft.TestTmp.dir("graft_lshcdc_src_")
    val idxDir = graft.TestTmp.dir("graft_lshcdc_idx_")
    val ckpt = graft.TestTmp.dir("graft_lshcdc_ck_")
    val d = (k: Int) => base + s" cdc family $k"
    // batch 0 inserts 3 docs; batch 1 deletes doc 31 and inserts one
    // (and 34 is inserted AND deleted in the SAME batch —
    // end-of-batch snapshot: the delete wins); batch 2 RE-INSERTS
    // doc 31 with new text — it must survive its older tombstone
    val batches: Seq[Seq[(Long, String, String)]] = Seq(
      Seq((30L, d(0), "I"), (31L, d(1), "I"), (32L, d(2), "I")),
      Seq((33L, d(3), "I"), (31L, null.asInstanceOf[String], "D"),
        (34L, d(4), "I"), (34L, null.asInstanceOf[String], "D")),
      Seq((31L, d(5), "I")))
    batches.foreach { b =>
      b.toDF("doc_id", "text", "op").coalesce(1)
        .write.mode("append").parquet(srcDir)
      LshIndexStream.startCdc(spark, srcDir, idxDir, ckpt)
        .awaitTermination()
    }
    // net corpus: 30, 32, 33 original; 31 re-inserted with d(5); 34 gone
    val net = Seq(30L -> d(0), 31L -> d(5), 32L -> d(2), 33L -> d(3))
      .toDF("doc_id", "text")
    val streamed = rowSet(LshIndexStream.index(spark, idxDir))
    val scratch = rowSet(graft.operators.LshIndexQueries.signatures(net))
    assert(streamed == scratch,
      s"diff: ${(streamed.diff(scratch) ++ scratch.diff(streamed)).take(5)}")
    assert(streamed.map(_._1) == Set(30L, 31L, 32L, 33L))
    // crash-redelivery of the delete batch: overwrite under the stable
    // id for BOTH the data dir and the tombstone sidecar — no-op
    LshIndexStream.mergeBatch(idxDir)(
      batches(1).toDF("doc_id", "text", "op"), 1L)
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == scratch,
      "replayed CDC batch changed the index")
  }

  test("compaction: the base snapshot preserves the live index, GC reclaims superseded dirs, folds and retraction keep working across the base") {
    import spark.implicits._
    val srcDir = graft.TestTmp.dir("graft_lshcomp_src_")
    val idxDir = graft.TestTmp.dir("graft_lshcomp_idx_")
    val ckpt = graft.TestTmp.dir("graft_lshcomp_ck_")
    val d = (k: Int) => base + s" compact family $k"
    def deliver(b: Seq[(Long, String, String)]): Unit = {
      b.toDF("doc_id", "text", "op").coalesce(1)
        .write.mode("append").parquet(srcDir)
      LshIndexStream.startCdc(spark, srcDir, idxDir, ckpt)
        .awaitTermination()
    }
    deliver(Seq((40L, d(0), "I"), (41L, d(1), "I"), (42L, d(2), "I")))
    deliver(Seq((43L, d(3), "I"),
      (41L, null.asInstanceOf[String], "D")))
    val before = rowSet(LshIndexStream.index(spark, idxDir))
    assert(before.map(_._1) == Set(40L, 42L, 43L))
    // compact: base cut at the newest batch, superseded dirs GONE
    assert(LshIndexStream.compact(spark, idxDir) == Some(1L))
    assert(new java.io.File(s"$idxDir/_base=1/_GRAFT_OK").isFile)
    def dirs(prefix: String) =
      Option(new java.io.File(idxDir).listFiles())
        .getOrElse(Array.empty).filter(_.getName.startsWith(prefix))
        .map(_.getName).sorted
    assert(dirs("batch=").isEmpty, "GC left superseded batch dirs")
    assert(Option(new java.io.File(s"$idxDir/_tombs").listFiles())
      .getOrElse(Array.empty).isEmpty, "GC left superseded tombstones")
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == before,
      "compaction changed the live index")
    // idempotent: nothing new to compact
    assert(LshIndexStream.compact(spark, idxDir) == Some(1L))
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == before)
    // the stream keeps folding PAST the base (checkpoint batch ids
    // keep rising), and a delete of a doc INSIDE the base retracts
    // across the base boundary (tombstone batch 2 > base upTo 1)
    deliver(Seq((44L, d(4), "I"),
      (40L, null.asInstanceOf[String], "D")))
    val net = Seq(42L -> d(2), 43L -> d(3), 44L -> d(4))
      .toDF("doc_id", "text")
    val after = rowSet(LshIndexStream.index(spark, idxDir))
    assert(after ==
      rowSet(graft.operators.LshIndexQueries.signatures(net)),
      "post-compaction fold/retraction diverged from from-scratch")
    // a redelivered PRE-compaction batch republishes a dir readers
    // ignore; the next compaction sweeps it
    LshIndexStream.mergeBatch(idxDir)(
      Seq((43L, d(3), "I"), (41L, null.asInstanceOf[String], "D"))
        .toDF("doc_id", "text", "op"), 1L)
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == after,
      "ignored pre-base redelivery changed the index")
    assert(LshIndexStream.compact(spark, idxDir) == Some(2L))
    assert(dirs("_base=").sameElements(Array("_base=2")),
      "old base not reclaimed")
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == after)
  }
}
