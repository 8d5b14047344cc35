package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the SparkSessionExtensions installer: SQL registration of
  * the native expressions and the FuseDotProduct optimizer rule. A
  * fresh session (over the shared SparkContext) is built with the
  * extensions and restored afterwards so other suites see the base
  * session. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A session with GraftExtensions installed. */
  private lazy val ext: SparkSession = {
    spark // force the base session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(spark)
    SparkSession.setActiveSession(spark)
    s
  }

  test("extensions register the native expressions as SQL functions") {
    assert(ext ne spark) // a new session over the shared context
    assert(ext.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))")
      .head().getDouble(0) == 11.0)
    assert(ext.sql("SELECT graft_shingles(array('a','b','c'), 2) AS s")
      .head().getSeq[String](0) == Seq("a b", "b c"))
    assert(ext.sql("SELECT graft_minhash(array('a','b'), 2) AS m")
      .head().getSeq[String](0).forall(_.length == 32))
  }

  test("FuseDotProduct rewrites the HOF pattern to graft_dot") {
    // built from range (not a LocalRelation) so the optimizer can't
    // constant-fold the projection away before we inspect the plan
    val df = ext.range(100).select(
      transform(sequence(lit(0), lit(7)),
        j => (col("id") + j).cast("double")).as("a"),
      // note: no %/division here — Remainder is nullable, which would
      // make containsNull=true and (correctly) block the rewrite
      transform(sequence(lit(0), lit(7)),
        j => (col("id") * j + lit(1)).cast("double")).as("b"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // and the fused result is the bit-identical fold
    val direct = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ==
      direct.collect().map(_.getDouble(0)).toSeq)
  }

  test("FuseDotProduct fires through SQL too") {
    val fused = ext.sql(
      """SELECT aggregate(
           zip_with(array(cast(id AS double), 2.0d), array(3.0d, 4.0d),
             (x,y) -> x*y),
           0.0d, (acc,x) -> acc+x) AS d
         FROM range(1)""")
    assert(fused.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(fused.head().getDouble(0) == 8.0)
  }

  test("FuseDotProduct leaves nullable-element arrays alone") {
    // if_(...) elements are nullable -> containsNull = true -> no
    // rewrite (HOF null semantics must be preserved)
    val hof = ext.sql(
      """SELECT aggregate(
           zip_with(array(if(id > 0, cast(id AS double), NULL), 2.0d),
             array(3.0d, 4.0d), (x,y) -> x*y),
           0.0d, (acc,x) -> acc+x) AS d
         FROM range(1)""")
    assert(!hof.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(hof.head().isNullAt(0))
  }
}
