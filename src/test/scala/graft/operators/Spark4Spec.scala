package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Spark 4 surface queries must be pure front-door changes: same
  * answers (and for pipe syntax, the same physical plan) as their
  * classic formulations.
  */
class Spark4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  test("q198: variant_get agrees with get_json_object row by row") {
    graft.Tables.load(graft.Tables.tuned(spark), dir, "events")
      .createOrReplaceTempView("s4_events")
    val diff = spark.sql("""
      SELECT COUNT(*) AS n FROM s4_events
      WHERE props IS NOT NULL
        AND NOT (variant_get(parse_json(props), '$.k', 'bigint') <=>
                 CAST(get_json_object(props, '$.k') AS BIGINT))
    """).collect().head.getLong(0)
    assert(diff == 0)
  }

  test("q199: pipe syntax plans identically to classic SQL") {
    graft.Tables.load(graft.Tables.tuned(spark), dir, "lineitem")
      .createOrReplaceTempView("graft_q199_lineitem")
    val pipe = df("q199_pipe_syntax").queryExecution.optimizedPlan
      .canonicalized
    val classic = spark.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM graft_q199_lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """).queryExecution.optimizedPlan.canonicalized
    assert(pipe.toString == classic.toString,
      "pipe syntax no longer optimizes to the classic plan")
  }

  test("q202: pages tile the sorted stream without overlap") {
    graft.Tables.load(graft.Tables.tuned(spark), dir, "orders")
      .createOrReplaceTempView("graft_q202_orders")
    def page(offset: Int) = spark.sql(s"""
      SELECT o_orderkey FROM graft_q202_orders
      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        DESC, o_orderkey
      LIMIT 10 OFFSET $offset
    """).collect().map(_.getLong(0)).toSeq
    val p0 = page(0); val p1 = page(10); val p2 = page(20)
    assert((p0 ++ p1 ++ p2).distinct.length == 30, "pages overlap")
    val top30 = spark.sql("""
      SELECT o_orderkey FROM graft_q202_orders
      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        DESC, o_orderkey
      LIMIT 30
    """).collect().map(_.getLong(0)).toSeq
    assert(p0 ++ p1 ++ p2 == top30,
      "pages do not tile the top-30 sort prefix")
    val q202 = df("q202_offset_pagination").collect()
      .map(_.getLong(0)).toSeq
    assert(q202 == p2, "q202 is not exactly the third page")
  }

  test("q200: collation grouping merges the case variants") {
    val rows = df("q200_collation_group").collect()
    val binaryGroups = graft.Tables
      .load(graft.Tables.tuned(spark), dir, "part")
      .select(when(col("p_partkey") % 2 === 0, lower(col("p_type")))
        .otherwise(col("p_type")).as("ptype"))
      .distinct().count()
    val lcGroups = rows.length.toLong
    assert(lcGroups < binaryGroups,
      s"collation grouping ($lcGroups) should merge case variants " +
        s"of $binaryGroups binary-distinct keys")
    rows.foreach(r => assert(r.getString(0) ==
      r.getString(0).toLowerCase(java.util.Locale.ROOT)))
  }

  test("q214: GROUP BY ALL plans identically to the explicit grouping") {
    val shorthand = df("q214_group_by_all").queryExecution.optimizedPlan
      .canonicalized
    val explicit = spark.sql("""
      SELECT o_orderpriority,
             CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM graft_q214_orders
      GROUP BY o_orderpriority, CAST(YEAR(o_orderdate) AS BIGINT)
      ORDER BY o_orderpriority, o_year, n, sum_price
    """).queryExecution.optimizedPlan.canonicalized
    assert(shorthand.toString == explicit.toString,
      "GROUP BY ALL no longer resolves to the explicit grouping plan")
  }

  test("parameterized SQL: named args + IDENTIFIER clause bind safely") {
    graft.Tables.load(graft.Tables.tuned(spark), dir, "nation")
      .createOrReplaceTempView("graft_param_nation")
    // the table name arrives as a PARAMETER (IDENTIFIER clause), the
    // predicate value as a typed named arg — no string interpolation,
    // so a hostile value cannot change the query's shape
    val got = spark.sql(
      "SELECT n_name FROM IDENTIFIER(:tbl) WHERE n_regionkey = :rk" +
        " ORDER BY n_name",
      Map("tbl" -> "graft_param_nation", "rk" -> 2))
      .collect().map(_.getString(0))
    val want = spark.table("graft_param_nation")
      .filter(col("n_regionkey") === 2)
      .orderBy(col("n_name")).select(col("n_name"))
      .collect().map(_.getString(0))
    assert(got.nonEmpty && got.sameElements(want))
    // a value that would inject under interpolation stays a value
    val inj = spark.sql(
      "SELECT COUNT(*) AS n FROM graft_param_nation WHERE n_name = :v",
      Map("v" -> "x' OR '1'='1")).collect()(0).getLong(0)
    assert(inj == 0L)
  }

  test("q215: try_* NULL counts match the guarded-CASE reference") {
    val rows = df("q215_try_arithmetic").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      for (c <- Seq("n_div0", "n_badcast", "n_overflow"))
        assert(r.getAs[Long](c) >= 0L && r.getAs[Long](c) <= n)
      // overflow fires for every k > 7 (the dominant class here) and
      // bad casts for k >= 50 — both must actually occur in the data
      assert(r.getAs[Long]("n_overflow") > 0L)
      assert(r.getAs[Long]("n_badcast") > 0L)
    }
  }
}
