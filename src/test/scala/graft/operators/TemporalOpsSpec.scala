package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the temporal/skew operators (q148-q151) beyond the
  * oracle hash: decay monotonicity, SCD2 interval chaining, the salted
  * join's physical plan (the pattern IS the plan), and cohort
  * conservation.
  */
class TemporalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  test("q148_decayed_agg: decayed sum is positive and below plain sum") {
    df("q148_decayed_agg").collect().foreach { r =>
      val plain = r.getAs[Double]("sum_value")
      val decayed = r.getAs[Double]("decayed_sum")
      assert(decayed > 0.0 && decayed < plain)
    }
  }

  test("q149_scd2_intervals: per-user intervals chain with one open end") {
    val rows = df("q149_scd2_intervals").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("valid_from_us"),
        Option(r.getAs[Any]("valid_to_us")).map(_.asInstanceOf[Long])))
    rows.groupBy(_._1).foreach { case (_, uRows) =>
      // exactly one current (open) interval per user
      assert(uRows.count(_._3.isEmpty) == 1)
      // closed intervals chain: each valid_to is some row's valid_from
      val froms = uRows.map(_._2).toSet
      uRows.flatMap(_._3).foreach(to => assert(froms.contains(to)))
    }
  }

  test("q150_salted_join plans a shuffled hash join on the salted key") {
    val plan = df("q150_salted_join").queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salt pattern must exercise the shuffle-join regime, got:\n$plan")
  }

  test("q152_markov_transitions: outgoing probabilities sum to 1 per state") {
    val rows = df("q152_markov_transitions").collect()
      .map(r => (r.getAs[String]("cur"), r.getAs[Double]("p")))
    rows.groupBy(_._1).foreach { case (cur, rs) =>
      val total = rs.map(_._2).sum
      assert(math.abs(total - 1.0) < 1e-4, s"$cur sums to $total")
    }
  }

  test("q153_inactivity_tiers: tiers partition the user base exactly") {
    val rows = df("q153_inactivity_tiers").collect()
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    val events = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    assert(rows.map(_.getAs[Long]("n_events")).sum == events)
  }

  test("q154_triangle_count matches a local adjacency-set recount") {
    val row = df("q154_triangle_count").collect().head
    // independent recount: undirected adjacency intersection, each
    // triangle (a<b<c) found once via its (a,b) edge
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter($"l_partkey" < 300)
      .select($"l_orderkey".as[Long], $"l_partkey".as[Long]).collect()
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val tri = edges.toSeq.map { case (a, b) =>
      out.getOrElse(a, Set.empty[Long])
        .count(c => out.getOrElse(b, Set.empty[Long]).contains(c))
    }.sum
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_triangles") == tri)
  }

  test("q155_full_outer_reconcile preserves both sides' keys") {
    val rows = df("q155_full_outer_reconcile").collect()
    val matched = rows.count(r =>
      r.getAs[Boolean]("has_orders") && r.getAs[Boolean]("is_flagged"))
    val leftOnly = rows.count(r =>
      r.getAs[Boolean]("has_orders") && !r.getAs[Boolean]("is_flagged"))
    val rightOnly = rows.count(r =>
      !r.getAs[Boolean]("has_orders") && r.getAs[Boolean]("is_flagged"))
    assert(matched + leftOnly + rightOnly == rows.length)
    // both sides' key sets survive the full outer join exactly
    import org.apache.spark.sql.functions.col
    val nLeft = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_custkey") < 200).select("o_custkey").distinct().count()
    val nRight = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") < 300 && col("c_acctbal") < 0).count()
    assert(matched + leftOnly == nLeft)
    assert(matched + rightOnly == nRight)
    assert(leftOnly > 0, "needs unmatched left keys")
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("custkey"))))
  }

  test("q156_corr_regression agrees with Spark's builtin corr") {
    import org.apache.spark.sql.functions.{corr => sparkCorr, col}
    val row = df("q156_corr_regression").collect().head
    val c = row.getAs[Double]("corr_qty_price")
    assert(c >= -1.0 && c <= 1.0)
    val builtin = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(sparkCorr(col("l_quantity"), col("l_extendedprice")))
      .head.getDouble(0)
    // builtin is a streaming co-moment (order-dependent); exact-moment
    // result must agree to float tolerance
    assert(math.abs(c - builtin) < 1e-6, s"exact=$c builtin=$builtin")
  }

  test("q151_retention_cohorts: every cohort has a week-0 row covering it") {
    val rows = df("q151_retention_cohorts").collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_users")))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (_, cRows) =>
      val week0 = cRows.filter(_._2 == 0L).map(_._3).sum
      // week-0 contains the cohort's defining activity, so its user
      // count must be the cohort maximum across offsets
      assert(week0 == cRows.map(_._3).max)
    }
  }
}
