package graft.operators

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** q275 — learning-to-rank reranker over the fused shortlist
  * (round-15 advice #4): the step a production RAG stack ships after
  * q271's RRF. A seeded GBT regressor (the q62 machinery) is fit on
  * pairwise features of the fused candidates — bm25, cosine sim,
  * document length, query-term overlap — against a deterministic
  * graded-relevance label, and the reranked order is graded with
  * q263's exact NDCG@10 algebra against the RRF order it replaces.
  *
  * Contract shape (the q250 pattern — a GBT fit is not
  * SQL-expressible): the OUTPUT is the oracle-exact per-candidate
  * feature/label table plus constant contract booleans the seeded
  * model must satisfy — reranker NDCG@10 beats-or-ties RRF's, and the
  * model actually discriminates (≥2 distinct predictions whenever the
  * labels themselves vary). LtrSpec pins the stronger planted-fixture
  * claim: on a corpus where relevant docs rank mediocre on BOTH single
  * arms, the reranker strictly finds them.
  *
  * Scale shape: corpus-scale work is q271's two scans plus ONE more
  * documents scan for features, joined against the broadcast ≤2K-row
  * fused shortlist (broadcast hash join — the corpus side never
  * shuffles). The fit, rerank windows, and NDCG algebra run on the
  * ≤2K-row frame (constant-bounded by construction). At 100 TB:
  * three scans, everything else constant.
  */
object LtrQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** q263's exact position-discount literals: 6-dp ln(p+1) computed at
    * query-build time, shipped to both engines — no libm in either
    * plan. */
  private val disc: Seq[Double] = (1 to 10).map(p =>
    BigDecimal(math.log(p + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Per-candidate features + label for the fused shortlist (≤2·K
    * rows): bm25 / sim from the arms (0.0 when absent from that arm's
    * shortlist), dl + overlap_cnt from ONE corpus scan broadcast-joined
    * to the shortlist, rel_u = 2·overlap_cnt + (on dense shortlist ?
    * 1 : 0) — graded lexical evidence plus dense corroboration, fully
    * oracle-exact. Candidates whose text is NULL carry no features and
    * are excluded (the q246 absence semantics). */
  private[graft] def features(s: SparkSession, dir: String): DataFrame = {
    val fusedTab = RetrievalQueries.fused(s, dir)
    val d = t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast(LongType).as("dl"),
        RetrievalQueries.terms.map(tm =>
          when(array_contains(col("w"), tm), 1L).otherwise(0L))
          .reduce(_ + _).as("overlap_cnt"))
    d.join(broadcast(fusedTab), "doc_id")
      .select(col("doc_id"),
        coalesce(col("bm25"), lit(0.0)).as("bm25f"),
        coalesce(round(col("sim"), 6), lit(0.0)).as("simf"),
        col("dl"), col("overlap_cnt"),
        (col("overlap_cnt") * 2 +
          when(col("dense_rank").isNotNull, 1L).otherwise(0L))
          .as("rel_u"),
        col("fused_rank"))
  }

  /** Fit the seeded reranker on the feature frame and return it with
    * `pred` appended. Deterministic: seeded GBT over a materialized
    * deterministic frame (the q250 discipline). */
  private[graft] def rerank(feats: DataFrame): DataFrame = {
    val labeled = feats
      .withColumn("rel_d", col("rel_u").cast(DoubleType))
      .localCheckpoint()
    val assembled = new VectorAssembler()
      .setInputCols(Array("bm25f", "simf", "dl", "overlap_cnt"))
      .setOutputCol("fv")
    val gbt = new GBTRegressor()
      .setLabelCol("rel_d").setFeaturesCol("fv")
      .setMaxIter(10).setSeed(7L)
    val withFv = assembled.transform(labeled)
    gbt.fit(withFv).transform(withFv)
      .withColumnRenamed("prediction", "pred")
      .drop("fv", "rel_d")
  }

  /** Exact DCG@10 term (q263's algebra): gain/discount rounded to 6 dp
    * and summed as DECIMAL(18,6) — order-independent, so the contract
    * booleans can never flutter on float summation order. */
  private def dcgTerm(rank: org.apache.spark.sql.Column,
      discLit: org.apache.spark.sql.Column) =
    sum(when(rank <= 10,
      round(col("rel_u").cast(DoubleType) /
        element_at(discLit, rank.cast(IntegerType)), 6)
        .cast(DecimalType(18, 6)))
      .otherwise(lit(0).cast(DecimalType(18, 6))))

  private[operators] val q275 = Q(
    "q275_ltr_rerank",
    (s, dir) => {
      val feats = features(s, dir)
      val scored = rerank(feats)
        .withColumn("rerank_rank",
          row_number().over(
            Window.orderBy(col("pred").desc, col("doc_id"))))
      val discLit = typedlit(disc)
      val contract = scored.agg(
        dcgTerm(col("rerank_rank"), discLit).as("dcg_rerank"),
        dcgTerm(col("fused_rank"), discLit).as("dcg_fused"),
        count_distinct(col("pred")).as("n_pred"),
        count_distinct(col("rel_u")).as("n_lab"))
        .select(
          (col("dcg_rerank") >= col("dcg_fused"))
            .as("rerank_ndcg_ge_rrf"),
          (col("n_lab") <= 1 || col("n_pred") >= 2)
            .as("pred_discriminates"),
          // the RRF arm's raw DCG@10, oracle-recomputed exactly
          // (round-16 advice): if the seeded-GBT contract boolean ever
          // flips red on an MLlib/JVM upgrade, a still-matching
          // dcg_fused isolates the failure to model drift, not a
          // broken NDCG algebra
          col("dcg_fused").cast(DecimalType(18, 6)).as("dcg_fused"))
      feats.crossJoin(broadcast(contract))
        .orderBy(col("fused_rank"))
    },
    Some(s"""
        WITH ${RetrievalQueries.fusionSql},
        d AS (
          SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS dl,
                 ${RetrievalQueries.terms.map(tm =>
                   s"CASE WHEN list_contains(w, '$tm') THEN 1 ELSE 0 END")
                   .mkString(" + ")} AS overlap_cnt
          FROM tok),
        feats AS (
          SELECT f.doc_id,
                 COALESCE(f.bm25, 0.0) AS bm25f,
                 COALESCE(round(f.sim, 6), 0.0) AS simf,
                 d.dl, CAST(d.overlap_cnt AS BIGINT) AS overlap_cnt,
                 CAST(d.overlap_cnt * 2 +
                   CASE WHEN f.dense_rank IS NOT NULL THEN 1 ELSE 0 END
                   AS BIGINT) AS rel_u,
                 f.fused_rank
          FROM fused f JOIN d USING (doc_id))
        SELECT doc_id, bm25f, simf, dl, overlap_cnt, rel_u, fused_rank,
               TRUE AS rerank_ndcg_ge_rrf, TRUE AS pred_discriminates,
               (SELECT CAST(SUM(CASE WHEN fused_rank <= 10
                   THEN CAST(round(CAST(rel_u AS DOUBLE) /
                     (${disc.map(d => f"$d%.6f").mkString("[", ", ", "]")})
                       [fused_rank], 6) AS DECIMAL(18,6))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,6))
                FROM feats) AS dcg_fused
        FROM feats ORDER BY fused_rank
        """))
}
