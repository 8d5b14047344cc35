package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** q280 — the MAINTAINED BM25 lexical index (q276's retrieval-side
  * sibling, closing the maintained-artifact family: LSH signatures
  * q276, tokenizers q242/q272, IVF shards q265). BM25's corpus state
  * is (per-term document frequency, corpus doc count, total document
  * length) — all ADDITIVE over disjoint shards, so the index supports
  * exact train-once/merge-many maintenance: stats(A) ⊕ stats(B) =
  * stats(A ∪ B) with no approximation, and scoring FROM the
  * maintained artifact reproduces the from-scratch q109/q271 lexical
  * ranking bit-for-bit (LexIndexSpec pins the equality; the oracle IS
  * q271's from-scratch lex derivation).
  *
  * Artifact layout (the shared [[LshIndexQueries.loadOrBuildParts]]
  * machinery): df/ holds the FULL-VOCABULARY (term, df) table — the
  * honest index, vocabulary-scale, never corpus-scale — and meta/
  * one (n_docs, sum_dl) row. At query time the per-doc tf scan is
  * unavoidable (scoring needs tf), but df/n/avgdl come off the
  * artifact — the corpus is never re-aggregated.
  */
object LexIndexQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  private def isHistory(c: org.apache.spark.sql.Column) =
    c % 4 =!= 3

  private def tok(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .withColumn("dl", size(col("w")).cast(LongType))

  /** Additive BM25 corpus state for a shard: full-vocab (term, df)
    * plus one (n_docs, sum_dl) row. dl is integer-valued, so the
    * Long sum is exact and avg-dl derived as sum/n is bit-identical
    * to a from-scratch AVG on any engine/partitioning. */
  private[graft] def stats(docs: DataFrame)
      : (DataFrame, DataFrame) = {
    val tk = tok(docs)
    val df = tk.select(explode(array_distinct(col("w"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val meta = tk.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    (df, meta)
  }

  private def shardStats(s: SparkSession, dir: String, tag: String,
      pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Map[String, () => DataFrame] =
    LshIndexQueries.loadOrBuildParts(s,
      LshIndexQueries.artifactPath(s, dir, tag), Seq("df", "meta"),
      () => {
        val (df, meta) = stats(t(s, dir, "documents")
          .filter(pred(col("doc_id"))))
        Map("df" -> df, "meta" -> meta)
      })

  private[graft] def historyStats(
      s: SparkSession, dir: String): Map[String, () => DataFrame] =
    shardStats(s, dir, "lexhist", isHistory)

  /** Exact merge: history artifact ⊕ the arriving shard's freshly
    * aggregated stats — per-term df adds under a full outer join,
    * (n_docs, sum_dl) adds componentwise. History text is never
    * re-tokenized; the merged artifact publishes for the next shard
    * (train-once / merge-many). */
  private[graft] def mergedStats(
      s: SparkSession, dir: String): Map[String, () => DataFrame] =
    LshIndexQueries.loadOrBuildParts(s,
      LshIndexQueries.artifactPath(s, dir, "lexmerged"),
      Seq("df", "meta"), () => {
        val hist = historyStats(s, dir)
        val (dfB, metaB) = stats(t(s, dir, "documents")
          .filter(!isHistory(col("doc_id"))))
        val df = hist("df")().withColumnRenamed("df", "df_a")
          .join(dfB.withColumnRenamed("df", "df_b"), Seq("term"),
            "full_outer")
          .select(col("term"),
            (coalesce(col("df_a"), lit(0L)) +
              coalesce(col("df_b"), lit(0L))).as("df"))
        val meta = hist("meta")()
          .crossJoin(broadcast(metaB
            .withColumnRenamed("n_docs", "n_b")
            .withColumnRenamed("sum_dl", "dl_b")))
          .select((col("n_docs") + col("n_b")).as("n_docs"),
            (col("sum_dl") + col("dl_b")).as("sum_dl"))
        Map("df" -> df, "meta" -> meta)
      })

  /** BM25 top-20 scored FROM the maintained artifact: one tf scan of
    * the corpus (projection-only), df looked up in the vocab artifact
    * (3 rows), n/avgdl off the 1-row meta — then q109's exact scoring
    * and a TakeOrderedAndProject shortlist. The output must equal
    * q271's from-scratch lexical arm exactly; the oracle is that
    * from-scratch derivation. */
  private val q280 = {
    val terms = RetrievalQueries.terms
    val k1 = 1.2
    val b = 0.75
    Q(
      "q280_bm25_index_maintain",
      (s, dir) => {
        val parts = mergedStats(s, dir)
        val tk = tok(t(s, dir, "documents"))
          .withColumn("dl", col("dl").cast(DoubleType))
        val tf = terms.zipWithIndex.foldLeft(tk) { case (d, (term, i)) =>
          d.withColumn(s"tf$i",
            size(filter(col("w"), x => x === term)).cast(DoubleType))
        }.drop("w")
        val dfAggs = terms.zipWithIndex.map { case (tm, i) =>
          coalesce(max(when(col("term") === tm, col("df"))), lit(0L))
            .cast(DoubleType).as(s"df$i")
        }
        val dfRow = parts("df")()
          .filter(col("term").isin(terms: _*))
          .agg(dfAggs.head, dfAggs.tail: _*)
        val statsRow = dfRow.crossJoin(broadcast(parts("meta")()))
          .select(col("n_docs").cast(DoubleType).as("n") +:
            (col("sum_dl").cast(DoubleType) /
              col("n_docs").cast(DoubleType)).as("avgdl") +:
            terms.indices.map(i => col(s"df$i")): _*)
        val score = terms.indices.map { i =>
          val idf = log(lit(1.0) +
            (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
          idf * (col(s"tf$i") * lit(k1 + 1)) /
            (col(s"tf$i") +
              lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
        }.reduce(_ + _)
        tf.crossJoin(broadcast(statsRow))
          .select(col("doc_id"), round(score, 4).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
          .withColumn("lex_rank",
            row_number().over(
              Window.orderBy(col("bm25").desc, col("doc_id")))
              .cast(LongType))
          .select(col("doc_id"), col("lex_rank"), col("bm25"))
          .orderBy(col("lex_rank"))
      },
      Some(s"""
        WITH ${RetrievalQueries.fusionSql}
        SELECT doc_id, lex_rank, bm25 FROM lex ORDER BY lex_rank
        """))
  }

  /** Exact subtraction of a retracted doc set from maintained BM25
    * stats: only the retracted docs are tokenized; per-term df and the
    * (n_docs, sum_dl) meta row subtract componentwise, and terms whose
    * df reaches zero leave the vocabulary (from-scratch stats on the
    * surviving corpus never saw them — LexIndexSpec pins the
    * equality). */
  private[graft] def subtractStats(dfA: DataFrame, metaA: DataFrame,
      retractedDocs: DataFrame): (DataFrame, DataFrame) = {
    val (dfD, metaD) = stats(retractedDocs)
    val df = dfA.withColumnRenamed("df", "df_a")
      .join(dfD.withColumnRenamed("df", "df_d"), Seq("term"),
        "left_outer")
      .select(col("term"),
        (col("df_a") - coalesce(col("df_d"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    val meta = metaA
      .crossJoin(broadcast(metaD
        .withColumnRenamed("n_docs", "n_d")
        .withColumnRenamed("sum_dl", "dl_d")))
      .select((col("n_docs") - col("n_d")).as("n_docs"),
        (col("sum_dl") - col("dl_d")).as("sum_dl"))
    (df, meta)
  }

  /** q291 — DELETION for the maintained BM25 index (round-17 advice
    * #1): the corpus state (per-term df, n_docs, sum_dl) is additive
    * over disjoint shards, and addition in ℤ has an inverse — so
    * retraction is EXACT SUBTRACTION: tokenize ONLY the retracted
    * docs, subtract their df/n/dl contributions from the maintained
    * artifact, drop terms whose df reaches zero. No surviving text is
    * re-tokenized (the maintained-artifact family is closed under a
    * GROUP, not just a merge monoid). Scoring from the repaired
    * stats over the surviving corpus must equal a from-scratch BM25
    * run on corpus-minus-deleted — the oracle is exactly that
    * derivation, with no knowledge of the artifact or the
    * subtraction. Tombstones follow the shared
    * [[ClusterIndexQueries.isRetracted]] predicate. */
  private val q291 = {
    val terms = RetrievalQueries.terms
    val k1 = 1.2
    val b = 0.75
    Q(
      "q291_bm25_index_delete",
      (s, dir) => {
        val parts = mergedStats(s, dir)
        val docs = t(s, dir, "documents")
        val retracted = ClusterIndexQueries.isRetracted(col("doc_id"))
        val (df, meta) =
          subtractStats(parts("df")(), parts("meta")(),
            docs.filter(retracted))
        val tk = tok(docs.filter(!retracted))
          .withColumn("dl", col("dl").cast(DoubleType))
        val tf = terms.zipWithIndex.foldLeft(tk) { case (d, (term, i)) =>
          d.withColumn(s"tf$i",
            size(filter(col("w"), x => x === term)).cast(DoubleType))
        }.drop("w")
        val dfAggs = terms.zipWithIndex.map { case (tm, i) =>
          coalesce(max(when(col("term") === tm, col("df"))), lit(0L))
            .cast(DoubleType).as(s"df$i")
        }
        val dfRow = df
          .filter(col("term").isin(terms: _*))
          .agg(dfAggs.head, dfAggs.tail: _*)
        val statsRow = dfRow.crossJoin(broadcast(meta))
          .select(col("n_docs").cast(DoubleType).as("n") +:
            (col("sum_dl").cast(DoubleType) /
              col("n_docs").cast(DoubleType)).as("avgdl") +:
            terms.indices.map(i => col(s"df$i")): _*)
        val score = terms.indices.map { i =>
          val idf = log(lit(1.0) +
            (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
          idf * (col(s"tf$i") * lit(k1 + 1)) /
            (col(s"tf$i") +
              lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
        }.reduce(_ + _)
        tf.crossJoin(broadcast(statsRow))
          .select(col("doc_id"), round(score, 4).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
          .withColumn("lex_rank",
            row_number().over(
              Window.orderBy(col("bm25").desc, col("doc_id")))
              .cast(LongType))
          .select(col("doc_id"), col("lex_rank"), col("bm25"))
          .orderBy(col("lex_rank"))
      },
      Some {
        val w =
          """string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')"""
        val tfCols = terms.zipWithIndex.map { case (term, i) =>
          s"CAST(len(list_filter(w, x -> x = '$term')) AS DOUBLE) AS tf$i"
        }.mkString(", ")
        val dfCols = terms.indices.map(i =>
          s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE)" +
            s" AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * " +
            s"(tf$i * ${k1 + 1}) / " +
            s"(tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))")
          .mkString(" + ")
        s"""
        WITH tok AS (SELECT doc_id, $w AS w FROM documents
                     WHERE text IS NOT NULL AND doc_id % 7 <> 3),
        tf AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfCols
               FROM tok),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                         SUM(dl) / COUNT(*) AS avgdl, $dfCols FROM tf),
        lex_top AS (
          SELECT doc_id, round($score, 4) AS bm25
          FROM tf, stats
          ORDER BY round($score, 4) DESC, doc_id LIMIT 20)
        SELECT doc_id, CAST(row_number() OVER
          (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank, bm25
        FROM lex_top ORDER BY lex_rank
        """
      })
  }

  val registry: Seq[Q] = Seq(q280, q291)
}
