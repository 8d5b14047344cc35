package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Queries

/** q286 (held-out LTR) invariants. The centerpiece is the 3-query
  * planted fixture: each query has its own relevant plant (weak on
  * both single arms, present on both shortlists), lexical spam, and
  * dense distractors. The reranker fits on queries 1–2 ONLY and must
  * rank query 0's full plant in its top 10 — generalization, not
  * memorization: query 0's shortlist never contributes a training
  * row, so the model can only surface the plant by having learned
  * the feature→relevance map from the other queries. */
class LtrHoldoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def q(n: String) = Queries.registry.find(_.name == n).get

  private val qterms = Seq(
    Seq("merge", "sort", "window"),
    Seq("hash", "join", "filter"),
    Seq("scan", "vector", "stream"))

  /** Per query q (plants at 100(q+1)+1 .. +10): relevant docs carry
    * q's terms once and sit at cosine ~0.8 of probe q; spam docs
    * (100q+11..20) repeat the terms ×10 with no embedding; dense
    * distractors (100q+21..29) hug probe q at ~0.95 with noise text;
    * noise (300..315) has neither. Probes are unit axes 0/1/2. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val tmp = graft.TestTmp.dir("graft_ltrho_fixture_")
    val filler = (1 to 10).map(k => s"filler$k").mkString(" ")
    val docs =
      (0 until 3).map(p => (p.toLong, s"probe doc $p $filler")) ++
        (0 until 3).flatMap { p =>
          val ts = qterms(p).mkString(" ")
          (1L to 10L).map(i =>
            (100L * (p + 1) + i, s"$ts $filler relevant${p}x$i")) ++
            (11L to 20L).map(i =>
              (100L * (p + 1) + i,
                Seq.fill(10)(ts).mkString(" ") + s" lex${p}x$i"))
        } ++
        (900L to 915L).map(i => (i, s"$filler noise$i"))
    docs.map { case (id, text) =>
      (id, text, "en", "s1", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val dim = 8
    val embs =
      (0 until 3).map { p =>
        val a = Array.fill(dim)(0.0f); a(p) = 1.0f
        (p.toLong, a)
      } ++
        (0 until 3).flatMap { p =>
          (1L to 10L).map { i =>
            val a = Array.fill(dim)(0.0f)
            a(p) = 0.8f; a(3 + p) = 0.6f
            a(6) = (0.001 * i).toFloat
            (100L * (p + 1) + i, a)
          } ++
            (21L to 29L).map { i =>
              val a = Array.fill(dim)(0.0f)
              a(p) = 0.95f; a(3 + p) = (0.002 * i).toFloat
              (100L * (p + 1) + i, a)
            }
        } ++
        (900L to 915L).map { i =>
          val a = Array.fill(dim)(0.0f)
          a(7) = 1.0f; a(6) = (0.01 * i).toFloat
          (i, a)
        }
    embs.map { case (id, v) => (id, v, id % 5) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("q286: held-out reranker beats RRF and surfaces query 0's full plant") {
    val rows = q("q286_ltr_heldout").build(spark, plantedDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("heldout_rerank_ge_rrf")),
      "held-out NDCG@10 fell below the RRF baseline")
    assert(rows.forall(_.getAs[Boolean]("pred_discriminates")))
    // training rows come from queries 1-2 only; the model must still
    // place ALL of query 0's plant (rel_u = 7: full overlap + dense
    // corroboration) above spam (6) and the probe (1)
    val relevant = (101L to 110L).toSet
    val top10 = LtrHoldoutQueries
      .heldoutRerank(LtrHoldoutQueries.features(spark, plantedDir))
      .collect()
      .sortBy(_.getAs[Int]("rerank_rank"))
      .take(10).map(_.getAs[Long]("doc_id"))
    assert(top10.count(relevant) == 10,
      s"held-out reranker top-10 = ${top10.mkString(",")}")
  }

  test("q286: every query contributes a shortlist; labels are exact feature algebra") {
    val rows = q("q286_ltr_heldout").build(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (_, rs) => assert(rs.length <= 40) }
    rows.foreach { r =>
      val overlap = r.getAs[Long]("overlap_cnt")
      val densein = r.getAs[Long]("densein")
      assert(overlap >= 0L && overlap <= 3L)
      assert(densein == 0L || densein == 1L)
      assert(r.getAs[Long]("rel_u") == 2 * overlap + densein)
      assert(r.getAs[Long]("dl") >= 1L)
    }
  }

  test("q292: every rotated fold beats RRF and surfaces its own plant") {
    val rows = q("q292_ltr_kfold").build(spark, plantedDir).collect()
    assert(rows.map(_.getAs[Long]("fold")).sorted.sameElements(
      Array(0L, 1L, 2L)))
    assert(rows.forall(_.getAs[Boolean]("heldout_rerank_ge_rrf")),
      "a fold's held-out NDCG@10 fell below the RRF baseline")
    assert(rows.forall(_.getAs[Boolean]("pred_discriminates")))
    // per-fold decimals sum to the emitted total exactly
    val sum = rows.map(r =>
      r.getAs[java.math.BigDecimal]("dcg_fused_heldout"))
      .reduce(_.add(_))
    rows.foreach(r => assert(
      r.getAs[java.math.BigDecimal]("sum_dcg_fused")
        .compareTo(sum) == 0, "sum_dcg_fused != Σ per-fold dcg"))
    // generalization per fold: fit on the other two queries only, the
    // held-out query's full plant (rel_u = 7) must fill the top 10
    val feats = LtrHoldoutQueries.features(spark, plantedDir)
      .localCheckpoint()
    (0L to 2L).foreach { f =>
      val relevant = ((f + 1) * 100L + 1L to (f + 1) * 100L + 10L).toSet
      val top10 = LtrHoldoutQueries.heldoutRerank(feats, f)
        .collect()
        .sortBy(_.getAs[Int]("rerank_rank"))
        .take(10).map(_.getAs[Long]("doc_id"))
      assert(top10.count(relevant) == 10,
        s"fold $f top-10 = ${top10.mkString(",")}")
    }
  }
}
