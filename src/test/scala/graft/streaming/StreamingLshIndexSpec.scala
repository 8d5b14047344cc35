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

  test("snapshot manifest: a pinned reader survives compact+GC that supersedes its dirs; dropping the lease releases them") {
    import spark.implicits._
    val srcDir = graft.TestTmp.dir("graft_lshsnap_src_")
    val idxDir = graft.TestTmp.dir("graft_lshsnap_idx_")
    val ckpt = graft.TestTmp.dir("graft_lshsnap_ck_")
    val d = (k: Int) => base + s" snapshot family $k"
    def deliver(b: Seq[(Long, String, String)]): Unit = {
      b.toDF("doc_id", "text", "op").coalesce(1)
        .write.mode("append").parquet(srcDir)
      LshIndexStream.startCdc(spark, srcDir, idxDir, ckpt)
        .awaitTermination()
    }
    deliver(Seq((50L, d(0), "I"), (51L, d(1), "I"), (52L, d(2), "I")))
    deliver(Seq((53L, d(3), "I"),
      (51L, null.asInstanceOf[String], "D")))
    // reader A pins the pre-compaction world (raw batch dirs, no base)
    val m0 = LshIndexStream.publishSnapshot(spark, idxDir)
    val worldAtM0 = rowSet(LshIndexStream.index(spark, idxDir))
    assert(worldAtM0.map(_._1) == Set(50L, 52L, 53L))
    // the world moves on: a new fold, then compact+GC cut a base at
    // the new frontier — which SUPERSEDES every dir m0 pinned
    deliver(Seq((54L, d(4), "I"),
      (50L, null.asInstanceOf[String], "D")))
    assert(LshIndexStream.compact(spark, idxDir) == Some(2L))
    def dirs(prefix: String) =
      Option(new java.io.File(idxDir).listFiles())
        .getOrElse(Array.empty).filter(_.getName.startsWith(prefix))
        .map(_.getName).sorted
    // retention floor: m0 pinned the no-base world, so GC must keep
    // ALL its batch dirs and tombstones despite the fresh base
    assert(dirs("batch=").sameElements(
      Array("batch=0", "batch=1", "batch=2")),
      "GC reclaimed dirs a live manifest pins")
    // the pinned reader still sees ITS world, not the moved-on one
    assert(rowSet(LshIndexStream.indexAt(spark, idxDir, m0))
      == worldAtM0, "pinned reader's world changed under it")
    val liveNow = rowSet(LshIndexStream.index(spark, idxDir))
    assert(liveNow.map(_._1) == Set(52L, 53L, 54L))
    assert(liveNow != worldAtM0)
    // reader B pins the compacted world; reader A's lease drops —
    // the next GC pass reclaims what only m0 was keeping alive
    val m1 = LshIndexStream.publishSnapshot(spark, idxDir)
    SnapshotManifest.drop(spark, idxDir, m0)
    assert(LshIndexStream.compact(spark, idxDir) == Some(2L))
    assert(dirs("batch=").isEmpty,
      "dropped lease did not release its dirs to GC")
    assert(rowSet(LshIndexStream.indexAt(spark, idxDir, m1)) == liveNow)
    assert(rowSet(LshIndexStream.index(spark, idxDir)) == liveNow)
    // a dropped manifest no longer resolves
    intercept[IllegalArgumentException] {
      LshIndexStream.indexAt(spark, idxDir, m0)
    }
    // cross-family manifests at a shared root: entries round-trip
    // verbatim and floor() takes the min over live pins only
    val root = graft.TestTmp.dir("graft_snaproot_")
    val a = SnapshotManifest.publish(spark, root,
      Map("lsh.base" -> "3", "ivf.gen" -> "2", "cluster.version" -> "7"))
    val b = SnapshotManifest.publish(spark, root, Map("lsh.base" -> "5"))
    assert(a != b)
    assert(SnapshotManifest.read(spark, root, a) ==
      Some(Map("lsh.base" -> "3", "ivf.gen" -> "2",
        "cluster.version" -> "7")))
    assert(SnapshotManifest.floor(spark, root, "lsh.base") == Some(3L))
    assert(SnapshotManifest.floor(spark, root, "cluster.version")
      == Some(7L))
    SnapshotManifest.drop(spark, root, a)
    assert(SnapshotManifest.floor(spark, root, "lsh.base") == Some(5L))
    assert(SnapshotManifest.floor(spark, root, "ivf.gen") == None)
  }
}
