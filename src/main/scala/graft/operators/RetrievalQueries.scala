package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** Hybrid-retrieval fusion (round-14 advice #4) and the trained
  * reranker on top of it (round-15 advice #4). q109 ranks documents
  * lexically (Okapi BM25), q53 ranks them densely (embedding cosine,
  * doc_id == vec_id — the q145/q248 join convention); a deployment
  * serves neither alone but their reciprocal-rank fusion, score =
  * Σ 1/(k + rank_i), k = 60 (Cormack & Clarke SIGIR'09's constant),
  * which rewards documents BOTH rankers like without trusting either's
  * raw score scale — and a production RAG stack then RERANKS the fused
  * shortlist with a trained model over pairwise features (q275).
  *
  * Exactness: ranks are integers, so RRF terms are computed in exact
  * integer micro-units — 1000000 div (60 + rank) — and summed as
  * BIGINTs; no floating point anywhere past the two source rankings,
  * whose orderings are already engine-parity-pinned (BM25 rounds to
  * 4 dp before ordering, the q109 discipline; the cosine fold is
  * bit-identical to DuckDB's list_dot_product, the q53 discipline).
  */
object RetrievalQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast(DoubleType))

  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorFunctions.dot(a, b)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private val duckCos =
    "list_dot_product(v, pv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(pv, pv)))"

  private[operators] val terms = Seq("merge", "sort", "tree")
  private val k1 = 1.2
  private val b = 0.75
  private val K = 20

  /** The two shortlist arms shared by q271 and q275:
    * (doc_id, lex_rank, bm25) and (doc_id, dense_rank, sim).
    *
    * Scale shape: the BM25 side is q109's — one tokenize+tf pass
    * materialized once, corpus stats reduced to ONE broadcast row,
    * scoring a pure projection, shortlist a TakeOrderedAndProject
    * (per-partition heap, never a global sort). The dense side is
    * q53's — broadcast 1-row probe, scan, TakeOrderedAndProject. The
    * only unpartitioned windows rank the two K-row shortlists
    * (constant-bounded by construction). At 100 TB the cost is the
    * two scans, same as running either ranker alone. */
  private[graft] def shortlists(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // ---- lexical arm: q109's BM25, shortlist depth K ----
    val tok = t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .withColumn("dl", size(col("w")).cast(DoubleType))
    val tf = terms.zipWithIndex.foldLeft(tok) { case (d, (term, i)) =>
      d.withColumn(s"tf$i",
        size(filter(col("w"), x => x === term)).cast(DoubleType))
    }.drop("w").localCheckpoint()
    val aggs = count(lit(1)).cast(DoubleType).as("n") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0))
          .cast(DoubleType).as(s"df$i"))
    val stats = tf.agg(aggs.head, aggs.tail: _*)
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      idf * (col(s"tf$i") * lit(k1 + 1)) /
        (col(s"tf$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    val lexTop = tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(K)
    val lex = lexTop
      .withColumn("lex_rank",
        row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"),
        col("lex_rank").cast(LongType).as("lex_rank"), col("bm25"))
    // ---- dense arm: q53's exact cosine, shortlist depth K ----
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("pv"))
    val denseTop = e.crossJoin(broadcast(probe))
      .withColumn("sim", cosine(col("v"), col("pv")))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(K)
    val dense = denseTop
      .withColumn("dense_rank",
        row_number().over(
          Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"),
        col("dense_rank").cast(LongType).as("dense_rank"), col("sim"))
    (lex, dense)
  }

  /** The shared lex/dense/fusion oracle CTEs (everything through the
    * `fused` table), parameterized so q271 and q275 stay one
    * derivation. */
  private[operators] def fusionSql: String = {
    val w = """string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')"""
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter(w, x -> x = '$term')) AS DOUBLE) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
      .mkString(", ")
    val score = terms.indices.map(i =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * ${k1 + 1}) / " +
        s"(tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))")
      .mkString(" + ")
    s"""
        tok AS (SELECT doc_id, $w AS w FROM documents
                WHERE text IS NOT NULL),
        tf AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfCols
               FROM tok),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
                         $dfCols FROM tf),
        lex_top AS (
          SELECT doc_id, round($score, 4) AS bm25
          FROM tf, stats
          ORDER BY round($score, 4) DESC, doc_id LIMIT $K),
        lex AS (
          SELECT doc_id, CAST(row_number() OVER
            (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank, bm25
          FROM lex_top),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
        dense_top AS (
          SELECT vec_id, $duckCos AS sim
          FROM e, p
          ORDER BY $duckCos DESC, vec_id ASC LIMIT $K),
        dense AS (
          SELECT vec_id AS doc_id, CAST(row_number() OVER
            (ORDER BY sim DESC, vec_id) AS BIGINT) AS dense_rank, sim
          FROM dense_top),
        fused AS (
          SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
                 l.lex_rank, l.bm25, d.dense_rank, d.sim,
                 COALESCE(1000000 // (60 + l.lex_rank), 0) +
                   COALESCE(1000000 // (60 + d.dense_rank), 0) AS rrf_u,
                 CAST(row_number() OVER (ORDER BY
                   COALESCE(1000000 // (60 + l.lex_rank), 0) +
                     COALESCE(1000000 // (60 + d.dense_rank), 0) DESC,
                   COALESCE(l.doc_id, d.doc_id)) AS BIGINT) AS fused_rank
          FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)"""
  }

  /** RRF fusion of the two shortlists: full outer join, exact integer
    * RRF algebra, final ranking — all on the two K-row frames. */
  private[graft] def fused(s: SparkSession, dir: String): DataFrame = {
    val (lex, dense) = shortlists(s, dir)
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + dense_rank)"), lit(0L)))
      .withColumn("fused_rank",
        row_number().over(
          Window.orderBy(col("rrf_u").desc, col("doc_id")))
          .cast(LongType))
  }

  /** Reciprocal-rank fusion of the lexical top-20 (q109's BM25 kernel,
    * terms merge/sort/tree) and the dense top-20 (q53's exact cosine
    * kernel, probe = vec 0) over the same document space. */
  private val q271 = Q(
    "q271_rrf_fusion",
    (s, dir) =>
      fused(s, dir)
        .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
          col("rrf_u"), col("fused_rank"))
        .orderBy(col("fused_rank")),
    Some(s"""
        WITH $fusionSql
        SELECT doc_id, lex_rank, dense_rank, rrf_u, fused_rank
        FROM fused ORDER BY fused_rank
        """))

  val registry: Seq[Q] = Seq(q271, LtrQueries.q275)
}
