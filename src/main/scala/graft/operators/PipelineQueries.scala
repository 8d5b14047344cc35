package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.Exprs._
import graft.functions.TextOps

/** Training-data-pipeline operators beyond the dedup/similarity core:
  * deterministic dataset splitting, benchmark decontamination,
  * boilerplate detection, text normalization, class-balanced
  * downsampling, unpivot, and quantile bucketing. Everything is
  * hash-deterministic (salted md5, never `rand()`), so results are
  * reproducible across engines, runs, and cluster sizes — the property
  * that makes a 100 TB pipeline re-runnable — and every query is
  * DuckDB-oracle-checked.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** DuckDB fragment: distinct n-word shingles of documents.text
    * (mirrors TextOps.words + shingleSet). */
  private def duckShingles(n: Int): String = {
    val w = """string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')"""
    s"""tok AS (SELECT doc_id, $w AS w FROM documents),
    sh AS (SELECT doc_id,
           list_distinct([array_to_string(w[i+1:i+$n],' ')
                          FOR i IN range(len(w)-${n - 1})]) AS sh
           FROM tok)"""
  }

  /** Deterministic train/val/test split: bucket by md5(doc_id) — stable
    * under re-runs, appends, and repartitioning, unlike `rand()` or
    * `monotonically_increasing_id` splits. Buckets 0-7 train, 8 val,
    * 9 test (80/10/10). The aggregate proves the split partitions the
    * corpus: per-split doc count and char volume. */
  private val q89 = Q(
    "q89_hash_split",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("bucket", md5Int32(col("doc_id").cast(StringType)) % 10)
        .withColumn("split",
          when(col("bucket") <= 7, "train")
            .when(col("bucket") === 8, "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          asLong(sum(col("n_chars"))).as("sum_chars")),
    Some("""
      SELECT CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
                  ELSE 'test' END AS split,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM (SELECT n_chars,
                   ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10 AS b
            FROM documents)
      GROUP BY 1
    """))

  /** Boilerplate detection: 8-gram shingles shared verbatim by several (>=3)
    * documents (the repeated-header/footer signal used to strip
    * boilerplate from web corpora). Count = DISTINCT docs, so a phrase
    * repeated inside one doc doesn't fake cross-doc boilerplate. */
  private val q90 = Q(
    "q90_boilerplate_ngrams",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.shingleSet(TextOps.words(col("text")), 8)).as("gram"))
        .groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("doc_freq"))
        .filter(col("doc_freq") >= 3),
    Some(s"""
      WITH ${duckShingles(8)},
      ex AS (SELECT doc_id, unnest(sh) AS gram FROM sh)
      SELECT gram, COUNT(DISTINCT doc_id) AS doc_freq
      FROM ex GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3
    """))

  /** Number normalization (the `<NUM>` preprocessing step): count and
    * replace digit runs. regexp_count + global regexp_replace. */
  private val q91 = Q(
    "q91_number_redaction",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          asLong(regexp_count(col("text"), lit("[0-9]+"))).as("n_nums"),
          substring(regexp_replace(col("text"), "[0-9]+", "<NUM>"), 1, 80)
            .as("redacted_head")),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
             substring(regexp_replace(text, '[0-9]+', '<NUM>', 'g'), 1, 80)
               AS redacted_head
      FROM documents
    """))

  /** Corpus-level n-gram statistics: top-20 bigrams with a total order
    * (count desc, gram asc) so the limit is deterministic. */
  private val q92 = Q(
    "q92_ngram_topk",
    (s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextOps.shingles(TextOps.words(col("text")), 2))
          .as("gram"))
        .groupBy(col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram"))
        .limit(20),
    Some("""
      WITH tok AS (
        SELECT string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ') AS w
        FROM documents),
      ex AS (SELECT unnest([array_to_string(w[i+1:i+2],' ')
                            FOR i IN range(len(w)-1)]) AS gram FROM tok)
      SELECT gram, COUNT(*) AS cnt FROM ex GROUP BY 1
      ORDER BY cnt DESC, gram LIMIT 20
    """))

  /** Unpivot (wide -> long): part metrics melted to (metric, val) rows
    * via the stack generator — the inverse of q68's pivot. */
  private val q93 = Q(
    "q93_unpivot",
    (s, dir) =>
      t(s, dir, "part")
        .selectExpr("p_partkey",
          "stack(2, 'size', CAST(p_size AS DOUBLE), " +
            "'retailprice', p_retailprice) AS (metric, val)"),
    Some("""
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
      FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice', p_retailprice FROM part
    """))

  /** Quantile bucketing: ntile(4) by account balance within market
    * segment (tie-broken by key for determinism), then per-bucket
    * stats — the feature-binning step of a tabular pipeline. */
  private val q94 = Q(
    "q94_ntile_buckets",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("q", ntile(4).over(w))
        .groupBy(col("c_mktsegment"), asLong(col("q")).as("q"))
        .agg(count(lit(1)).as("n"),
          moneySum(col("c_acctbal")).as("bal_sum"))
    },
    Some("""
      SELECT c_mktsegment, CAST(q AS BIGINT) AS q, COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
      FROM (SELECT c_mktsegment, c_acctbal,
                   ntile(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) AS q
            FROM customer)
      GROUP BY 1, 2
    """))

  /** Class-balanced downsampling: cap every event_type at 1,000 rows,
    * chosen by hash order (row_number over md5(event_id)) — the
    * deterministic equivalent of stratified sampling, reproducible at
    * any cluster size. */
  private val q95 = Q(
    "q95_balanced_downsample",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(md5(col("event_id").cast(StringType)))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 1000)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          moneySum(col("value")).as("value_sum"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      FROM (SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
            FROM events)
      WHERE rn <= 1000
      GROUP BY 1
    """))

  /** Benchmark decontamination: fraction of each document's distinct
    * 8-grams that appear in a "benchmark" subset (doc_id % 97 == 0).
    * The benchmark gram set is small by construction → broadcast join;
    * at 100 TB the corpus side streams map-side against it with no
    * shuffle of the corpus. Reports docs with >= 50% overlap (the
    * benchmark docs themselves score 1.0 — the self-hit sanity check).
    */
  private val q96 = Q(
    "q96_contamination",
    (s, dir) => {
      val ex = t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.shingleSet(TextOps.words(col("text")), 8).as("sh"))
        .select(col("doc_id"), asLong(size(col("sh"))).as("n_sh"),
          explode(col("sh")).as("gram"))
      val bench = ex.filter(col("doc_id") % 97 === 0)
        .select(col("gram")).distinct()
      ex.join(broadcast(bench), "gram")
        .groupBy(col("doc_id"), col("n_sh"))
        .agg(count(lit(1)).as("n_hit"))
        .withColumn("ratio",
          round(col("n_hit").cast(DoubleType) / col("n_sh"), 6))
        .filter(col("ratio") >= 0.5)
        .select(col("doc_id"), col("n_sh"), col("n_hit"), col("ratio"))
    },
    Some(s"""
      WITH ${duckShingles(8)},
      ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
                    unnest(sh) AS gram FROM sh),
      bench AS (SELECT DISTINCT gram FROM ex WHERE doc_id % 97 = 0),
      hits AS (SELECT doc_id, n_sh, COUNT(*) AS n_hit
               FROM ex JOIN bench USING (gram)
               GROUP BY 1, 2)
      SELECT doc_id, n_sh, n_hit,
             round(CAST(n_hit AS DOUBLE) / n_sh, 6) AS ratio
      FROM hits WHERE CAST(n_hit AS DOUBLE) / n_sh >= 0.5
    """))

  /** ORC round-trip: write suppliers to ORC, scan it back, aggregate.
    * Exercises the third columnar source/sink format (parquet and CSV
    * round-trips are q70/q72); the oracle computes the same aggregate
    * from the original parquet — a faithful round-trip is invisible. */
  private val q97 = Q(
    "q97_orc_roundtrip",
    (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_orc_").toString
      t(s, dir, "supplier").write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          moneySum(col("s_acctbal")).as("bal_sum"))
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
      FROM supplier GROUP BY 1
    """))

  /** CDC-style MERGE (upsert): a deterministic change set — updates for
    * keys % 7 == 0 (status -> 'U', price + 100) and inserts at
    * key + 10,000,000 for keys % 1000 == 0 — applied to orders with the
    * full-outer-join + coalesce pattern (MERGE without a table format:
    * changed rows win, unmatched base rows pass through, unmatched
    * change rows insert). One shuffle on the merge key; with bucketed
    * base and change tables it is co-located and shuffle-free. */
  private val q98 = Q(
    "q98_merge_upsert",
    (s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val changes = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          lit("U").as("c_status"),
          (dec2(col("o_totalprice")) + dec2(lit(100.0)))
            .cast(DoubleType).as("c_price"))
        .unionByName(base.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("I").as("c_status"), col("o_totalprice").as("c_price")))
      base.join(changes, Seq("o_orderkey"), "full_outer")
        .select(
          coalesce(col("c_status"), col("o_orderstatus")).as("status"),
          coalesce(col("c_price"), col("o_totalprice")).as("price"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), moneySum(col("price")).as("price_sum"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      changes AS (
        SELECT o_orderkey, 'U' AS c_status,
               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    + CAST(100.0 AS DECIMAL(18,2)) AS DOUBLE) AS c_price
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'I', o_totalprice
        FROM base WHERE o_orderkey % 1000 = 0),
      merged AS (
        SELECT COALESCE(c.c_status, b.o_orderstatus) AS status,
               COALESCE(c.c_price, b.o_totalprice) AS price
        FROM base b FULL OUTER JOIN changes c USING (o_orderkey))
      SELECT status, COUNT(*) AS n,
             CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      FROM merged GROUP BY 1
    """))

  /** Text (line-oriented) source/sink round-trip — the raw-corpus
    * interchange format. Content equality is order-independent: line
    * count plus a sum of per-line 32-bit md5 fingerprints (and total
    * length), reproducible from the parquet original by the oracle. */
  private val q100 = Q(
    "q100_text_roundtrip",
    (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_text_").toString
      t(s, dir, "documents").select(col("text"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .agg(count(lit(1)).as("n_lines"),
          asLong(sum(md5Int32(col("value")))).as("content_sum"),
          asLong(sum(length(col("value")))).as("sum_len"))
    },
    Some("""
      SELECT COUNT(*) AS n_lines,
             CAST(SUM(('0x'||substr(md5(text),1,8))::BIGINT) AS BIGINT)
               AS content_sum,
             CAST(SUM(length(text)) AS BIGINT) AS sum_len
      FROM documents
    """))

  /** Intra-document repetition filter (the Gopher/C4-style quality
    * rule): fraction of a document's 3-gram occurrences that are
    * repeats of an earlier 3-gram in the same document; docs above 20%
    * are flagged. Pure per-row projection over the native shingle
    * expressions — no shuffle at all. */
  private val q107 = Q(
    "q107_repetition_filter",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("w", TextOps.words(col("text")))
        .select(col("doc_id"),
          asLong(size(TextOps.shingles(col("w"), 3))).as("n_grams"),
          asLong(size(TextOps.shingles(col("w"), 3)) -
            size(TextOps.shingleSet(col("w"), 3))).as("n_repeats"))
        .withColumn("rep_frac",
          round(when(col("n_grams") > 0,
            col("n_repeats").cast(DoubleType) / col("n_grams"))
            .otherwise(0.0), 6))
        .withColumn("flagged", col("rep_frac") > 0.2)
        .select(col("doc_id"), col("n_grams"), col("rep_frac"),
          col("flagged")),
    Some("""
      WITH tok AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               [array_to_string(w[i+1:i+3],' ') FOR i IN range(len(w)-2)] AS g
        FROM tok)
      SELECT doc_id,
             CAST(len(g) AS BIGINT) AS n_grams,
             round(CASE WHEN len(g) > 0
                   THEN CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
                   ELSE 0.0 END, 6) AS rep_frac,
             (CASE WHEN len(g) > 0
              THEN CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
              ELSE 0.0 END) > 0.2 AS flagged
      FROM sh
    """))

  val registry: Seq[Q] =
    Seq(q89, q90, q91, q92, q93, q94, q95, q96, q97, q98, q100, q107)
}
