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

  test("q248 semantic decontamination equals the brute-force cosine scan") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def perturb(v: Array[Double]): Array[Double] =
      v.zipWithIndex.map { case (x, i) => if (i % 7 == 0) x + 0.01 else x }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val evals = e.keys.filter(_ % 50 == 0)
      .map(k => (-k - 1) -> perturb(e(k))).toMap
    val truth = (for {
      (t, tv) <- e.toSeq; (eid, ev) <- evals if cos(tv, ev) >= 0.99
    } yield (t, eid)).toSet
    val rows = run("q248_semantic_decontamination")
    val got = rows
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"))).toSet
    // equality (not just subset) is the measured recall contract on the
    // fixture: every planted perturbation stays within one hyperplane
    // flip, so the 1-bit multiprobe reaches every true bucket
    assert(got == truth,
      s"flag sets diverge: missed ${truth -- got}, spurious ${got -- truth}")
    rows.foreach { r =>
      val sim = r.getAs[Double]("sim")
      val want = cos(e(r.getAs[Long]("train_id")),
        evals(r.getAs[Long]("eval_id")))
      assert(math.abs(sim - math.rint(want * 1e6) / 1e6) < 1e-9,
        s"sim mismatch for $r: $sim vs $want")
    }
  }

  test("q247 verdict: paraphrase plants are semantic-only with full recall") {
    val rows = run("q247_decontam_verdict")
    // eval-id encoding: −2k−1 near-copy, −2k−2 embedded extract,
    // −2k−3 paraphrase, k ≡ 0 mod 50 ⇒ (−eval_id) % 100 ∈ {1, 2, 3}
    rows.foreach { r =>
      val shape = (-r.getAs[Long]("eval_id")) % 100
      r.getAs[String]("method") match {
        case "semantic" =>
          assert(shape == 3, s"semantic flag on non-paraphrase eval: $r")
          assert(r.getAs[Double]("sim") >= 0.99)
          assert(r.isNullAt(r.fieldIndex("jac")) &&
            r.isNullAt(r.fieldIndex("containment")), s"lexical cols on $r")
        case _ =>
          assert(shape == 1 || shape == 2,
            s"lexical flag on paraphrase eval — the rewrite leaked: $r")
          assert(r.isNullAt(r.fieldIndex("sim")), s"sim on lexical row $r")
      }
    }
    val semPairs = rows.filter(_.getAs[String]("method") == "semantic")
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"))).toSet
    val embIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id").collect().map(_.getLong(0)).toSet
    val docIds = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0)).toSet
    val plants = (docIds & embIds).filter(_ % 50 == 0)
    assert(plants.nonEmpty)
    plants.foreach(k => assert(semPairs.contains((k, -2 * k - 3)),
      s"paraphrase plant $k not flagged by the semantic path"))
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

  test("q254 power iteration equals the brute-force mirror with PCA invariants") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dim = 64
    // exact milli-unit quantization, ties half-away-from-zero (both
    // engines' round contract)
    def q(x: Float): Long = {
      val y = x.toDouble * 1000.0
      if (y < 0) -Math.round(-y) else Math.round(y)
    }
    val m = Array.ofDim[Long](dim * dim)
    vecs.foreach { v =>
      val xs = v.map(q)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { m(i * dim + j) += xs(i) * xs(j); j += 1 }
        i += 1
      }
    }
    // index-ordered folds, exactly the engine's arithmetic order
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += m(i * dim + j).toDouble * v(j); j += 1 }
        acc
      }
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { acc += a(i) * b(i); i += 1 }
      acc
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to 8) {
      val w = matvec(v)
      val n = math.sqrt(dotd(w, w))
      v = w.map(_ / n)
    }
    val lambda = dotd(v, matvec(v))
    val mx = v.map(math.abs).max
    val sgn = if (v(v.indexWhere(x => math.abs(x) == mx)) < 0) -1.0 else 1.0
    val rows = run("q254_pca_power_iteration").sortBy(_.getAs[Long]("i"))
    assert(rows.length == dim)
    rows.foreach { r =>
      val i = r.getAs[Long]("i").toInt
      assert(math.abs(r.getAs[Double]("loading") - v(i) * sgn) < 1e-6,
        s"component $i diverges from the brute-force mirror")
      assert(math.abs(r.getAs[Double]("eigenvalue") - lambda) < 5e-3)
    }
    val loadings = rows.map(_.getAs[Double]("loading"))
    // unit norm (up to the 6-decimal output rounding)
    assert(math.abs(loadings.map(x => x * x).sum - 1.0) < 1e-3)
    // sign convention: the max-|loading| component is positive
    assert(loadings.maxBy(math.abs) > 0)
    // Rayleigh estimate bounded by the spectrum: >= max diagonal
    // (one-hot Rayleigh quotient after 8 ascent steps from all-ones
    // may still be below it in theory, but must hold on the fixture)
    // and <= trace
    val diag = (0 until dim).map(i => m(i * dim + i).toDouble)
    assert(lambda <= diag.sum * (1 + 1e-12))
    assert(lambda > 0.0)
  }

  test("q255 ABTT projections match the mirror PC and bound the residual") {
    // recompute the mirror PC exactly as the q254 test does
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray)
    val dim = 64
    def q(x: Float): Long = {
      val y = x.toDouble * 1000.0
      if (y < 0) -Math.round(-y) else Math.round(y)
    }
    val m = Array.ofDim[Long](dim * dim)
    raw.foreach { case (_, v) =>
      val xs = v.map(q)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { m(i * dim + j) += xs(i) * xs(j); j += 1 }
        i += 1
      }
    }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += m(i * dim + j).toDouble * v(j); j += 1 }
        acc
      }
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { acc += a(i) * b(i); i += 1 }
      acc
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to 8) {
      val w = matvec(v)
      val n = math.sqrt(dotd(w, w))
      v = w.map(_ / n)
    }
    val mx = v.map(math.abs).max
    val sgn = if (v(v.indexWhere(x => math.abs(x) == mx)) < 0) -1.0 else 1.0
    val pc = v.map(_ * sgn)
    val truth = raw.map { case (id, f) =>
      val dv = f.map(_.toDouble)
      (id, dotd(dv, pc), math.sqrt(dotd(dv, dv)))
    }.sortBy { case (id, p, _) => (-math.abs(p), id) }.take(20)
    val rows = run("q255_abtt_projection")
    assert(rows.length == 20)
    rows.zip(truth).foreach { case (r, (id, p, nrm)) =>
      assert(r.getAs[Long]("vec_id") == id)
      assert(math.abs(r.getAs[Double]("proj") - p) < 1e-6)
      val rr = r.getAs[Double]("resid_ratio")
      assert(rr >= 0.0 && rr <= 1.0)
      // Pythagoras: resid² + (proj/||v||)² = 1
      assert(math.abs(rr * rr + (p / nrm) * (p / nrm) - 1.0) < 1e-4)
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
