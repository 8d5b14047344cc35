package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-write semantics a warehouse depends on daily: dynamic
  * partition overwrite must replace ONLY the partitions present in the
  * incoming batch (the nightly re-load of one day), while static mode
  * — Spark's default — truncates the whole table first. Getting this
  * wrong at 100 TB deletes every historical partition on the first
  * single-day backfill, so the semantic difference is pinned here in
  * both directions.
  */
class PartitionWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def freshTable(): String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_dpo_").toString
    graft.Tables.load(graft.Tables.tuned(spark), dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority").as("prio"))
      .write.mode("overwrite").partitionBy("prio").parquet(out)
    out
  }

  private def countsByPrio(path: String): Map[String, Long] =
    spark.read.parquet(path).groupBy(col("prio")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("dynamic partition overwrite replaces only the touched partition") {
    val out = freshTable()
    val before = countsByPrio(out)
    assert(before.size == 5)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try {
      // backfill ONE partition with a single replacement row
      spark.range(1).select(lit(-1L).as("o_orderkey"),
        lit(0.0).as("o_totalprice"), lit("1-URGENT").as("prio"))
        .write.mode("overwrite").partitionBy("prio").parquet(out)
      val after = countsByPrio(out)
      assert(after("1-URGENT") == 1L,
        "the touched partition was not replaced")
      (before.keySet - "1-URGENT").foreach { p =>
        assert(after.get(p).contains(before(p)),
          s"untouched partition $p was modified by a dynamic overwrite")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
  }

  test("static overwrite (the default) truncates the whole table") {
    val out = freshTable()
    assert(countsByPrio(out).size == 5)
    spark.range(1).select(lit(-1L).as("o_orderkey"),
      lit(0.0).as("o_totalprice"), lit("1-URGENT").as("prio"))
      .write.mode("overwrite").partitionBy("prio").parquet(out)
    val after = countsByPrio(out)
    assert(after == Map("1-URGENT" -> 1L),
      "static overwrite should have replaced the entire table — if this" +
        " fails, Spark's default overwrite semantics changed")
  }
}
