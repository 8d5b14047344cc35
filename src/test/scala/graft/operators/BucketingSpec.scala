package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout scale patterns: bucketed tables co-locate join keys
  * so the join needs no shuffle at all — at 100 TB this removes the
  * dominant cost of repeated fact-to-fact joins. Also pins the join
  * strategies (broadcast for small dims, shuffle-hash on hint), the
  * range-sorted write layout (disjoint per-file key ranges — the file
  * skipping property), and statistics-driven broadcast planning
  * (ANALYZE TABLE flips a partitioned catalog dimension to broadcast).
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans without any shuffle exchange") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    // the session (and so the warehouse dir) may be shared and carry
    // state from an earlier run — clear table names AND locations
    val wh = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_customer").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(wh, tbl)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucket alignment: no Exchange (shuffle) anywhere in the plan
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and the result is still correct
      assert(joined.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("join strategy control: broadcast by default for small dims, shuffle-hash on hint") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    val bhj = orders.join(broadcast(customer),
      col("o_custkey") === col("c_custkey"))
    assert(bhj.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))

    val shj = orders.join(customer.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey"))
    assert(shj.queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"))
  }

  test("repartitionByRange write layout yields disjoint per-file key ranges") {
    // The range-sorted write layout — the single-column complement of
    // z-order (q122/q210) and the property parquet/Delta file skipping
    // needs: repartitionByRange assigns disjoint key ranges to output
    // tasks (equal keys never straddle a boundary) and
    // sortWithinPartitions orders rows inside each file, so a range
    // predicate prunes to the few files whose [min,max] overlap it.
    // At 100 TB this is how a time-series table is laid out for
    // shipdate-range scans without any index structure.
    val out = java.nio.file.Files
      .createTempDirectory("graft_range_").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .repartitionByRange(4, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(out)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(unix_micros(to_timestamp(col("l_shipdate")))).as("lo"),
        max(unix_micros(to_timestamp(col("l_shipdate")))).as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length == 4)
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, prevHi), (nextLo, _)) =>
        assert(prevHi <= nextLo,
          s"file ranges overlap: $prevHi > $nextLo — file skipping broken")
      case _ =>
    }
  }

  test("ANALYZE TABLE statistics flip the catalog-table join to broadcast") {
    // Statistics-driven planning — the mechanism a 100 TB warehouse
    // relies on for automatic broadcast decisions: a PARTITIONED
    // catalog table without stats (and fallBackToHdfs off) reports
    // defaultSizeInBytes = Long.MaxValue (listing every partition just
    // to size it would be the scale hazard), so the planner
    // conservatively refuses to broadcast it; ANALYZE TABLE COMPUTE
    // STATISTICS records the real size and the SAME query plans a
    // BroadcastHashJoin. Nightly ANALYZE (or format-native stats) is
    // what keeps dimension joins broadcast at scale without per-query
    // hints. (An UNpartitioned table sizes itself from the file index
    // up front, so the conservative path is specific to partitioned
    // layouts — which is what big dimensions are.)
    val wh = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    spark.sql("DROP TABLE IF EXISTS s_nation")
    val loc = new java.io.File(wh, "s_nation")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    spark.read.parquet(s"$dir/nation.parquet")
      .write.mode("overwrite").partitionBy("n_regionkey")
      .saveAsTable("s_nation")
    val fallbackBefore =
      spark.conf.getOption("spark.sql.statistics.fallBackToHdfs")
    spark.conf.set("spark.sql.statistics.fallBackToHdfs", "false")
    // threshold sized between the dimension (~3 KB) and the fact
    // (~115 KB), so ONLY the analyzed dimension can ever qualify
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      def planStr = li.join(spark.table("s_nation"),
        col("l_suppkey") % 25 === col("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(!planStr.contains("BroadcastHashJoin"),
        "stats-less catalog table must not be assumed broadcastable")
      spark.sql("ANALYZE TABLE s_nation COMPUTE STATISTICS")
      assert(planStr.contains("BroadcastHashJoin"),
        "computed statistics should enable the broadcast join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      fallbackBefore match {
        case Some(v) =>
          spark.conf.set("spark.sql.statistics.fallBackToHdfs", v)
        case None =>
          spark.conf.unset("spark.sql.statistics.fallBackToHdfs")
      }
    }
  }
}
