package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew handling: a hot join key concentrates most rows in
  * one shuffle partition; with skew-join enabled AQE splits that
  * partition into sub-partitions at runtime (the `skew=true` marker in
  * the final adaptive plan). At 100 TB this is the difference between
  * one straggler task owning half the data and N parallel tasks.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    import spark.implicits._
    // 100k rows, 90% on key 1
    val left = spark.range(100000)
      .select(when(col("id") < 90000, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = spark.range(2000)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
    val joined = left.join(right, "k")
    // execute THIS Dataset's QueryExecution so the adaptive plan
    // finalizes (count() would build a separate aggregated plan)
    val rows = joined.collect()
    // only the hot key overlaps the right side: 90k x 1 match
    assert(rows.length == 90000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew split in final plan:\n$finalPlan")
  }
}
