package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Queries, Tables}

/** q277 (CDC AS-OF snapshot) invariants — above all the lakehouse
  * replay-equivalence contract that makes snapshots trustworthy:
  * reconstructing state at k and replaying the tail must land exactly
  * where a full replay lands, for ANY cut point k. */
class CdcSnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def log() =
    CdcOps.changeLog(
      Tables.load(Tables.tuned(spark), dir, "orders")).localCheckpoint()

  private def stateSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("at_seq"), col("op"),
        col("price").cast("decimal(19,2)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDecimal(3)))
      .toSet

  private def kFrameAt(l: org.apache.spark.sql.DataFrame, frac: Double) =
    l.agg((max(col("seq")) * lit((frac * 100).toInt) / lit(100))
      .cast("long").as("asof_seq"))

  test("replay-equivalence: snapshot(k) + tail == snapshot(max), several cut points") {
    val l = log()
    val full = stateSet(CdcOps.snapshotAsOf(l,
      l.agg(max(col("seq")).as("asof_seq"))))
    assert(full.nonEmpty)
    for (frac <- Seq(0.0, 0.25, 0.6, 0.99)) {
      val kAt = kFrameAt(l, frac)
      val k = kAt.head().getLong(0)
      val snap = CdcOps.snapshotAsOf(l, kAt)
      val tail = l.filter(col("seq") > k)
      val replayed = stateSet(CdcOps.replay(snap, tail))
      assert(replayed == full,
        s"replay from cut $frac diverges: ${
          (replayed.diff(full) ++ full.diff(replayed)).take(3)}")
    }
  }

  test("snapshot semantics: deletes hide keys, updates win over inserts") {
    val l = log()
    val snapAll = CdcOps.snapshotAsOf(l,
      l.agg(max(col("seq")).as("asof_seq")))
    val rows = snapAll.collect()
    // no key divisible by 7 survives a full replay (deleted last)
    assert(rows.forall(_.getAs[Long]("k") % 7 != 0))
    // every surviving key divisible by 3 shows its update, not insert
    rows.filter(_.getAs[Long]("k") % 3 == 0).take(50).foreach { r =>
      assert(r.getAs[String]("op") == "U")
    }
    // a cut BEFORE any key's delete keeps the key: snapshot at the
    // smallest delete seq minus 1 must contain that key
    val firstDel = l.filter(col("op") === "D")
      .agg(min(col("seq"))).head().getLong(0)
    val preDel = CdcOps.snapshotAsOf(l,
      spark.sql(s"SELECT CAST(${firstDel - 1} AS BIGINT) AS asof_seq"))
    val delKey = (firstDel - 2) / 3
    assert(preDel.filter(col("k") === delKey).count() == 1,
      s"key $delKey missing just before its delete at seq $firstDel")
  }

  test("q277 registry output accounts for the full key space at the cut") {
    val r277 = Queries.registry.find(_.name == "q277_cdc_asof_snapshot")
      .get.build(spark, dir).collect()
    assert(r277.nonEmpty)
    val ops = r277.map(_.getAs[String]("op")).toSet
    assert(ops.subsetOf(Set("I", "U")) && ops.contains("I"))
    r277.foreach { r =>
      assert(r.getAs[Long]("n_keys") > 0)
      assert(r.getAs[Long]("max_at_seq") <= r.getAs[Long]("asof_seq"))
    }
  }

  test("truncation identity: checkpoint(k) + truncated tail reaches any j > k (q285)") {
    val l = log()
    val maxSeq = l.agg(max(col("seq"))).head().getLong(0)
    for ((kf, jf) <- Seq((0.0, 0.5), (0.25, 0.6), (0.4, 0.8),
        (0.6, 1.0))) {
      val k = (maxSeq * (kf * 100).toInt) / 100
      val j = (maxSeq * (jf * 100).toInt) / 100
      val ck = CdcOps.snapshotAsOf(l,
        spark.sql(s"SELECT CAST($k AS BIGINT) AS asof_seq"))
      // the retention scenario: the prefix <= k is GONE — only the
      // checkpoint and the (k, j] slice remain
      val truncTail = l.filter(col("seq") > k && col("seq") <= j)
      val fromCheckpoint = stateSet(CdcOps.replay(ck, truncTail))
      val fromFullLog = stateSet(CdcOps.snapshotAsOf(l,
        spark.sql(s"SELECT CAST($j AS BIGINT) AS asof_seq")))
      assert(fromCheckpoint == fromFullLog,
        s"truncation at k=$kf, j=$jf diverges: ${
          (fromCheckpoint.diff(fromFullLog) ++
            fromFullLog.diff(fromCheckpoint)).take(3)}")
    }
  }

  test("q285 registry output matches q277's summary shape at the later cut") {
    val r285 = Queries.registry
      .find(_.name == "q285_cdc_checkpoint_truncate")
      .get.build(spark, dir).collect()
    assert(r285.nonEmpty)
    r285.foreach { r =>
      assert(r.getAs[Long]("ck_seq") < r.getAs[Long]("asof_seq"))
      assert(r.getAs[Long]("n_keys") > 0)
      assert(r.getAs[Long]("max_at_seq") <= r.getAs[Long]("asof_seq"))
    }
  }
}
