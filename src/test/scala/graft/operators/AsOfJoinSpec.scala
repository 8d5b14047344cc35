package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf picks the latest strictly-earlier right row per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 10:00:03"), "t3")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:07"), 101.0),
      (2L, ts("2024-01-01 10:00:03"), 55.0), // equal ts: must NOT match
      (3L, ts("2024-01-01 09:00:00"), 9.0)).toDF("k", "ts", "price")

    val out = AsOfJoin.asOf(trades, quotes, "k", "ts", "ts")
      .select("trade", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap

    assert(out("t1").contains(100.0)) // 10:00:00 quote, not 10:00:07
    assert(out("t2").contains(101.0)) // latest earlier quote wins
    assert(out("t3").isEmpty)         // equal-ts quote excluded (strict <)
  }

  test("asOf keeps every left row (left-outer semantics)") {
    import spark.implicits._
    val left = Seq((9L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "ts", "v")
    val right = Seq((8L, ts("2023-01-01 00:00:00"), 1.0)).toDF("k", "ts", "p")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Any]("p") == null)
  }

  test("native AsOfJoinExec agrees with the composed kernel row for row") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(graft.Tables.tuned(spark), dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val composed = AsOfJoin.asOf(errors, clicks,
        key = "user_id", leftTs = "ts", rightTs = "ts")
      .select(col("event_id"), col("click_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val nativeDf = graft.plans.NativeAsOf.join(errors,
      clicks.select(col("user_id").as("asof_user_id"),
        col("ts").as("asof_ts"), col("click_id")),
      key = "user_id", rightKey = "asof_user_id",
      leftTs = "ts", rightTs = "asof_ts")
    val plan = nativeDf.queryExecution.executedPlan.toString
    // Spark prints the exec's nodeName with the "Exec" suffix stripped
    assert(plan.contains("AsOfJoin"),
      "native as-of did not plan through the custom exec")
    val native = nativeDf.select(col("event_id"), col("click_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native == composed && native.nonEmpty)
  }

  test("composed kernel: null keys never match (SQL equality semantics)") {
    import spark.implicits._
    val trades = Seq(
      (Option(1L), ts("2024-01-01 10:00:05"), "t1"),
      (Option.empty[Long], ts("2024-01-01 10:00:05"), "tnull"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (Option(1L), ts("2024-01-01 10:00:00"), 100.0),
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 666.0))
      .toDF("k", "ts", "price")
    val out = AsOfJoin.asOf(trades, quotes, "k", "ts", "ts")
      .select("trade", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1").contains(100.0))
    assert(out("tnull").isEmpty,
      "composed kernel must agree with the native exec on NULL keys")
  }

  test("native exec: null keys never match (SQL equality semantics)") {
    import spark.implicits._
    val trades = Seq(
      (Option(1L), ts("2024-01-01 10:00:05"), "t1"),
      (Option.empty[Long], ts("2024-01-01 10:00:05"), "tnull"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (Option(1L), ts("2024-01-01 10:00:00"), 100.0),
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 666.0))
      .toDF("qk", "qts", "price")
    val out = graft.plans.NativeAsOf.join(trades, quotes,
        key = "k", rightKey = "qk", leftTs = "ts", rightTs = "qts")
      .select("trade", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1").contains(100.0))
    assert(out("tnull").isEmpty, "NULL = NULL must not match")
  }

  test("native exec output feeds a hash aggregate directly (UnsafeRow)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0)).toDF("qk", "qts", "price")
    // no intervening Project: groupBy directly over the exec's raw
    // output must not ClassCastException on a non-Unsafe row
    val joined = graft.plans.NativeAsOf.join(trades, quotes,
      key = "k", rightKey = "qk", leftTs = "ts", rightTs = "qts")
    val agg = joined.groupBy(joined("k"))
      .agg(count(lit(1)).as("n"), sum(joined("price")).as("p"))
      .collect()
    assert(agg.length == 1 && agg.head.getLong(1) == 2L &&
      agg.head.getDouble(2) == 200.0)
  }

  test("native exec: strict-inequality ties and unmatched keys") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 10:00:03"), "t3")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:07"), 101.0),
      (2L, ts("2024-01-01 10:00:03"), 55.0),
      (3L, ts("2024-01-01 09:00:00"), 9.0))
      .toDF("qk", "qts", "price")
    val out = graft.plans.NativeAsOf.join(trades, quotes,
        key = "k", rightKey = "qk", leftTs = "ts", rightTs = "qts")
      .select("trade", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1").contains(100.0))
    assert(out("t2").contains(101.0))
    assert(out("t3").isEmpty)
  }
}
