package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Queries

/** q271 (RRF fusion) and q274 (selection curve) invariants.
  *
  * The q271 centerpiece is the planted-relevance fixture: a corpus
  * where the truly relevant documents rank MEDIOCRE on each single
  * ranker (crowded out by lexical-only and dense-only distractors)
  * but appear on BOTH shortlists — the regime RRF exists for. Fusion
  * must beat both components on precision@10 against the plant. */
class FusionCurveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def q(n: String) = Queries.registry.find(_.name == n).get

  // ------------------------------------------------------------------
  // q271
  // ------------------------------------------------------------------

  /** Fixture: relevant docs 1..10 carry the query terms once (weak
    * lexical signal) and sit at cosine ~0.8 of the probe (weak dense
    * signal). Lexical distractors 11..20 spam the terms; dense
    * distractors 21..29 hug the probe at ~0.95. Noise 30..45 has
    * neither. Every single-ranker top-10 is dominated by its
    * distractor family; only fusion surfaces the plant. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val tmp = graft.TestTmp.dir("graft_rrf_fixture_")
    val filler = (1 to 10).map(k => s"filler$k").mkString(" ")
    val docs =
      Seq((0L, s"probe doc $filler")) ++
        (1L to 10L).map(i => (i, s"merge sort tree $filler relevant$i")) ++
        (11L to 20L).map(i =>
          (i, Seq.fill(10)("merge sort tree").mkString(" ") + s" lex$i")) ++
        (30L to 45L).map(i => (i, s"$filler noise$i"))
    docs.map { case (id, text) =>
      (id, text, "en", "s1", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val dim = 8
    def vec(main: Double, tilt: Double): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(0) = main.toFloat; a(1) = tilt.toFloat
      a
    }
    val embs =
      Seq((0L, vec(1.0, 0.0))) ++
        (1L to 10L).map(i => (i, {
          val a = Array.fill(dim)(0.0f)
          a(0) = 0.8f; a(1) = (0.01 * i).toFloat; a(2) = 0.6f
          a
        })) ++
        (21L to 29L).map(i => (i, vec(0.95, 0.001 * i))) ++
        (30L to 45L).map(i => (i, {
          val a = Array.fill(dim)(0.0f)
          a(3) = 1.0f; a(4) = (0.01 * i).toFloat
          a
        }))
    embs.map { case (id, v) => (id, v, id % 5) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("q271: fusion beats both single rankers on the planted-relevance fixture") {
    val relevant = (1L to 10L).toSet
    val rows = q("q271_rrf_fusion").build(spark, plantedDir).collect()
    def precAt10(rank: org.apache.spark.sql.Row => Option[Long]): Double =
      rows.flatMap(r => rank(r).map(_ -> r.getAs[Long]("doc_id")))
        .sortBy(_._1).take(10).count(p => relevant(p._2)) / 10.0
    val pFused = precAt10(r => Some(r.getAs[Long]("fused_rank")))
    val pLex = precAt10(r =>
      if (r.isNullAt(r.fieldIndex("lex_rank"))) None
      else Some(r.getAs[Long]("lex_rank")))
    val pDense = precAt10(r =>
      if (r.isNullAt(r.fieldIndex("dense_rank"))) None
      else Some(r.getAs[Long]("dense_rank")))
    assert(pFused == 1.0, s"fused precision@10 = $pFused")
    assert(pLex <= 0.5 && pDense <= 0.5,
      s"fixture failed to crowd out the plant (lex=$pLex dense=$pDense)")
    assert(pFused >= pLex && pFused >= pDense)
  }

  test("q271: rrf_u is the exact integer micro-unit sum of the rank terms") {
    val rows = q("q271_rrf_fusion").build(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      def term(c: String): Long =
        if (r.isNullAt(r.fieldIndex(c))) 0L
        else 1000000L / (60L + r.getAs[Long](c))
      assert(r.getAs[Long]("rrf_u") == term("lex_rank") + term("dense_rank"))
      assert(!r.isNullAt(r.fieldIndex("lex_rank")) ||
        !r.isNullAt(r.fieldIndex("dense_rank")))
    }
    // fused_rank is the dense ranking of rrf_u with doc_id ties
    val sorted = rows.sortBy(r =>
      (-r.getAs[Long]("rrf_u"), r.getAs[Long]("doc_id")))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("fused_rank") == i + 1)
    }
  }

  // ------------------------------------------------------------------
  // q275
  // ------------------------------------------------------------------

  test("q275: reranker beats-or-ties RRF and ranks the full plant on top") {
    val relevant = (1L to 10L).toSet
    val rows = q("q275_ltr_rerank").build(spark, plantedDir).collect()
    assert(rows.nonEmpty)
    // the contract booleans the registry output carries must hold on
    // the planted fixture too (they are per-run model facts)
    assert(rows.forall(_.getAs[Boolean]("rerank_ndcg_ge_rrf")),
      "reranker NDCG@10 fell below RRF's on the planted fixture")
    assert(rows.forall(_.getAs[Boolean]("pred_discriminates")))
    // stronger than beats-or-ties: the reranked order must place ALL
    // ten planted-relevant docs in its top 10 — they are the only
    // candidates with BOTH full term overlap and dense-shortlist
    // corroboration, so a model that learned the features at all
    // separates them (rel_u = 7 vs 6 for lexical spam, 1 for the probe)
    val scored = LtrQueries.rerank(LtrQueries.features(spark, plantedDir))
      .collect()
    val top10 = scored
      .sortBy(r => (-r.getAs[Double]("pred"), r.getAs[Long]("doc_id")))
      .take(10).map(_.getAs[Long]("doc_id"))
    assert(top10.count(relevant) == 10,
      s"reranker top-10 = ${top10.mkString(",")}")
  }

  test("q275: feature table is exact over the fused candidates") {
    val rows = q("q275_ltr_rerank").build(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      val overlap = r.getAs[Long]("overlap_cnt")
      val rel = r.getAs[Long]("rel_u")
      assert(overlap >= 0L && overlap <= 3L)
      // rel_u = 2*overlap + dense-presence bit
      assert(rel == 2 * overlap || rel == 2 * overlap + 1,
        s"doc ${r.getAs[Long]("doc_id")}: rel_u $rel vs overlap $overlap")
      assert(r.getAs[Double]("bm25f") >= 0.0)
      assert(r.getAs[Long]("dl") >= 1L)
    }
  }

  // ------------------------------------------------------------------
  // q274
  // ------------------------------------------------------------------

  test("q274: kept mass is monotonically non-increasing in the threshold") {
    val rows = q("q274_selection_curve").build(spark, dir).collect()
    val byThr = rows.groupBy(_.getAs[Long]("thr_u")).view
      .mapValues(rs => (rs.map(_.getAs[Long]("n_docs")).sum,
        rs.map(_.getAs[Long]("n_tokens")).sum))
      .toMap.toSeq.sortBy(_._1)
    assert(byThr.nonEmpty && byThr.head._1 == 0L)
    byThr.sliding(2).foreach {
      case Seq((t1, (d1, k1)), (t2, (d2, k2))) =>
        assert(d1 >= d2 && k1 >= k2,
          s"kept mass grew from thr $t1 to $t2")
      case _ => ()
    }
    // per-threshold composition shares sum to 1e6 minus integer-div loss
    rows.groupBy(_.getAs[Long]("thr_u")).foreach { case (t, rs) =>
      val s = rs.map(_.getAs[Long]("cell_tok_share_u")).sum
      assert(s <= 1000000L && s > 1000000L - rs.length,
        s"thr $t: shares sum to $s over ${rs.length} cells")
    }
  }

  test("q274 at threshold 0 reproduces q270's gate lattice exactly") {
    val curve0 = q("q274_selection_curve").build(spark, dir).collect()
      .filter(_.getAs[Long]("thr_u") == 0L)
      .map(r => (r.getAs[Boolean]("pass_len"), r.getAs[Boolean]("pass_rep"),
        r.getAs[Boolean]("pass_mwl")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toMap
    val lattice = q("q270_gate_ablation").build(spark, dir).collect()
      .map(r => (r.getAs[Boolean]("pass_len"), r.getAs[Boolean]("pass_rep"),
        r.getAs[Boolean]("pass_mwl")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toMap
    assert(curve0 == lattice)
  }
}
