package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every relational query in the registry runs at sf0.001 and returns
  * rows (the ML/streaming entries are exercised by their own specs and
  * are skipped here to keep the suite fast). Catches schema drift,
  * bad column references, and accidentally-empty results before the
  * driver's gate does.
  */
class RegistrySmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val slow = Set(
    "q60_ml_kmeans", "q61_ml_gbt_regression", "q62_ml_gbt_classifier",
    "q63_ml_cumulative_train", "q43_stream_tumbling",
    "q44_stream_batchwriter")

  Queries.registry.filterNot(q => slow(q.name)).foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.build(spark, dir)
      // plan audit: an accidental cartesian product would "work" at
      // sf0.001 and detonate at scale — fail it here
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      assert(df.count() > 0)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
