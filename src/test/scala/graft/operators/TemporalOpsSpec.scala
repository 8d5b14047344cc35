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
