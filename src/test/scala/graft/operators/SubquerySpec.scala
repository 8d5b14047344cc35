package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force recomputation of the subquery suite
  * (q185-q189) — each test rebuilds the answer from collected base
  * tables with plain Scala collections, so a decorrelation bug in the
  * engine path can't be masked by an equivalent bug in the SQL oracle.
  */
class SubquerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  private def table(name: String) =
    graft.Tables.load(graft.Tables.tuned(spark), dir, name)

  private def cents(colName: String) =
    (col(colName).cast("decimal(18,2)") * 100).cast("long")

  private lazy val li = table("lineitem")
    .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      cents("l_extendedprice").as("price_cents"),
      col("l_quantity").cast("long").as("qty"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)))

  test("q185_min_cost_supplier: each row is its part's true minimum") {
    val minCost = li.groupBy(_._2).view
      .mapValues(_.groupBy(_._3).values.map(_.map(_._4).min).min).toMap
    val got = df("q185_min_cost_supplier").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("cost_cents") == minCost(r.getAs[Long]("p_partkey")))
    }
    assert(got.nonEmpty)
  }

  test("q186_top_supplier: returned revenue is the global quarter max") {
    val got = df("q186_top_supplier").collect()
    assert(got.nonEmpty)
    val revs = table("lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("r"))
      .collect().map(_.getDecimal(1))
    val mx = revs.max
    got.foreach(r => assert(BigDecimal(r.getAs[Double]("total_revenue")) ==
      BigDecimal(mx.doubleValue)))
    assert(revs.count(_ == mx) == got.length)
  }

  test("q187_large_volume: exactly the orders above the quantity cut") {
    val bigOrders = li.groupBy(_._1).view.mapValues(_.map(_._5).sum)
      .filter(_._2 > 300L).toMap
    val got = df("q187_large_volume").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("total_qty"))
    assert(got.nonEmpty && got.length == math.min(20, bigOrders.size))
    got.foreach { case (ok, q) => assert(bigOrders(ok) == q) }
  }

  test("q188_semi_chain: every selected supplier clears 1.05x average") {
    val parts = table("part").filter(col("p_name").like("%a%"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val slice = li.filter(l => parts(l._2)).groupBy(_._3).view
      .mapValues(_.map(_._5).sum).toMap
    val n = slice.size.toLong; val tot = slice.values.sum
    val expect = slice.filter { case (_, q) => q * n * 20 > tot * 21 }
      .keySet
    val got = df("q188_semi_chain").collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("q189_balance_opportunity: segment counts match brute force") {
    val cust = table("customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        cents("c_acctbal").as("bal_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val urgent = table("orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val nPos = pos.length.toLong; val sumPos = pos.sum
    val expect = cust
      .filter(c => c._3 * nPos > sumPos && !urgent(c._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = df("q189_balance_opportunity").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("numcust")).toMap
    assert(got == expect && got.nonEmpty)
  }
}
