package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the embedding-semantics operators (q145-q147) that
  * the oracle's hash compare can't express directly: dedup recall on
  * the planted near-dups, keeper canonicality, hard-negative label
  * discipline, and centroid-similarity bounds.
  */
class SemanticOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Queries.queries(name)(spark, dir).collect()

  test("q145_semdedup drops every planted near-dup, keeps canonical ids") {
    val rows = run("q145_semdedup")
    val dropped = rows.map(r => r.getAs[Long]("dropped_id")).toSet
    // each planted copy (vec_id+200000) must be caught by its original:
    // the perturbation is one +0.02 component, cosine ~0.9998 >= 0.99
    val planted = (0L until 25L).map(_ + 200000L).toSet
    assert(planted.subsetOf(dropped),
      s"missed plants: ${planted -- dropped}")
    // greedy-by-id keep rule: keeper is always a strictly lower id
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_id") < r.getAs[Long]("dropped_id"))
      assert(r.getAs[Double]("max_sim") >= 0.99)
    }
  }

  test("q146_hard_negatives returns 3 per probe, never the probe's label") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = run("q146_hard_negatives")
    assert(rows.length == 8 * 3)
    rows.foreach { r =>
      val probeLabel = e(r.getAs[Long]("probe_id"))
      assert(r.getAs[Long]("neg_label") != probeLabel.toLong)
      assert(r.getAs[Long]("rn") >= 1 && r.getAs[Long]("rn") <= 3)
    }
  }

  test("literal LSH planes equal the md5 expression they precompute") {
    // the literal arrays shipped into every LSH query must stay
    // bit-identical to the md5 expression form the DuckDB oracles
    // still compute — this is what keeps the fold-at-build-time
    // optimization differentially honest
    (0 until 8).foreach { p =>
      val fromExpr = spark.range(1)
        .select(SimilarityQueries.planeSparkExpr(p).as("v"))
        .head.getSeq[Double](0)
      assert(fromExpr == SimilarityQueries.planeVals(p), s"plane $p")
    }
  }

  test("q147_centroid_similarity covers all label pairs with bounded sims") {
    val rows = run("q147_centroid_similarity")
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label").distinct().count()
    assert(rows.length == labels * (labels - 1) / 2)
    rows.foreach { r =>
      val sim = r.getAs[Double]("sim")
      assert(sim >= -1.0 && sim <= 1.0)
      assert(r.getAs[Long]("label_a") < r.getAs[Long]("label_b"))
    }
  }
}
