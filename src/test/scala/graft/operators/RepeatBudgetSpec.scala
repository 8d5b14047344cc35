package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Queries

/** q288 (repeat-budget waterfill) invariants: budget conservation,
  * cap dominance, the common-λ property for uncapped sources, and
  * the waterfill identity Σ min(λ, cap_s)·a_s ≤ B < Σ min(λ+1,
  * cap_s)·a_s (λ is the LARGEST feasible level — one more µ-epoch
  * would overrun, unless every source is capped). */
class RepeatBudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(dir: String) = Queries.registry
    .find(_.name == "q288_repeat_budget").get
    .build(spark, dir).collect()

  test("waterfill identities on the real fixture") {
    val rs = rows("/root/testdata/sf0.001")
    assert(rs.nonEmpty)
    val lambda = rs.map(_.getAs[Long]("lambda_u")).distinct
    assert(lambda.length == 1, "lambda_u must be one common level")
    val lam = lambda.head
    val budget = rs.head.getAs[Long]("budget_tokens")
    val spent = rs.map(_.getAs[Long]("alloc_tokens")).sum
    val remainder = rs.head.getAs[Long]("remainder_tokens")
    assert(spent + remainder == budget, "conservation")
    assert(remainder >= 0, "overspend")
    rs.foreach { r =>
      val capU = r.getAs[Long]("cap_u")
      val allocU = r.getAs[Long]("alloc_u")
      assert(allocU == math.min(lam, capU), "alloc = min(lambda, cap)")
      assert(r.getAs[Boolean]("capped") == (capU <= lam))
      assert(r.getAs[Long]("alloc_tokens") ==
        allocU * r.getAs[Long]("a_tokens") / 1000000L)
    }
    // maximality: one more µ-epoch on the uncapped mass overruns the
    // budget (unless everyone is capped)
    val anyUncapped = rs.exists(!_.getAs[Boolean]("capped"))
    if (anyUncapped) {
      val wouldSpendU = rs.map { r =>
        math.min(lam + 1, r.getAs[Long]("cap_u")) *
          r.getAs[Long]("a_tokens")
      }.sum
      assert(wouldSpendU > budget * 1000000L,
        "lambda is not maximal: one more micro-epoch still fits")
    }
  }

  test("closed-form two-source case") {
    import spark.implicits._
    val tmp = graft.TestTmp.dir("graft_rb_fixture_")
    // source A: 10 tokens/doc x 10 docs = 100 tokens, source B: 100
    // tokens in one doc; caps are hash-derived so read them from the
    // output and check the waterfill against a reimplementation
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val w100 = (1 to 100).map(i => s"v$i").mkString(" ")
    val docs = (1L to 10L).map(i => (i, w10, "en", "srcA", 10L)) :+
      ((11L, w100, "en", "srcB", 100L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rs = rows(tmp).sortBy(_.getAs[String]("source"))
    assert(rs.map(_.getAs[String]("source")).toSeq ==
      Seq("srcA", "srcB"))
    assert(rs.forall(_.getAs[Long]("a_tokens") == 100L))
    // independent waterfill over the two (a=100) sources at B = 600
    val caps = rs.map(_.getAs[Long]("cap_u")).sorted
    val bU = 600L * 1000000L
    val expectedLam =
      if (bU / 200L < caps(0)) bU / 200L // nobody capped
      else if ((bU - caps(0) * 100L) / 100L < caps(1))
        (bU - caps(0) * 100L) / 100L // low-cap source capped
      else caps(1) // both capped
    assert(rs.head.getAs[Long]("lambda_u") == expectedLam,
      s"caps=${caps.toSeq} lambda=${rs.head.getAs[Long]("lambda_u")}")
  }
}
