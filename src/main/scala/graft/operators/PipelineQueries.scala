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
    * repeated inside one doc doesn't fake cross-doc boilerplate.
    *
    * Adaptive grain (round-19, the census discipline): on a
    * replicated corpus the doc-grain 8-gram explode is ~replication×
    * redundant (the round-18 q251 mechanism — this query doubled
    * 4.9→10.0 s across same-fixture ×100 sweeps), so at ≥1.5×
    * replication the shingles are computed once per DISTINCT content
    * and doc_freq = Σ member-doc counts of the contents carrying the
    * gram — exact, because a doc has exactly one content and its
    * shingle set is distinct (disjoint doc sets per content).
    * Measured 2.8–3.2 s vs 5.7–8.0 s at ×100 (SCALE.md round-19
    * SpreadProf table); an unreplicated corpus keeps the plain
    * doc-grain shape and pays no grouping shuffle. */
  private val q90 = Q(
    "q90_boilerplate_ngrams",
    (s, dir) => {
      // ONE normalize pass feeds the census AND both grain branches
      // (round-19 advice #4: the census must not re-introduce a
      // census-sized corpus toll on the unreplicated branch — the
      // checkpointed frame is reused, never re-derived). words(text)
      // == split(norm(text), " ") by definition, so shingling the
      // cached nt is the same grams as the old doc-grain shape; the
      // null filter matches explode(null)'s row-dropping.
      val base = t(s, dir, "documents")
        .withColumn("nt", TextOps.norm(col("text")))
        .filter(col("nt").isNotNull)
        .select(col("doc_id"), md5(col("nt")).as("h"), col("nt"))
        .localCheckpoint()
      if (DedupQueries.contentGrainByCensus(base))
        ShufflePlan.pinnedByKey(
          base.select(col("h"), col("nt")), col("h"))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("n_docs"), min(col("nt")).as("nt"))
          .select(col("n_docs"),
            explode(TextOps.shingleSet(split(col("nt"), " "), 8))
              .as("gram"))
          .groupBy(col("gram"))
          .agg(sum(col("n_docs")).as("doc_freq"))
          .filter(col("doc_freq") >= 3)
      else
        base
          .select(col("doc_id"),
            explode(TextOps.shingleSet(split(col("nt"), " "), 8))
              .as("gram"))
          .groupBy(col("gram"))
          .agg(countDistinct(col("doc_id")).as("doc_freq"))
          .filter(col("doc_freq") >= 3)
    },
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
    * stats — the feature-binning step of a tabular pipeline. Only 5
    * segments exist but each holds |customers|/5 rows (fact-scaled),
    * so `ntile over Window.partitionBy(segment)` would run as 5
    * single tasks each sorting a fifth of the dimension; instead the
    * within-segment rank comes from [[PrefixPass.withRowNumberByGroup]]
    * (range-partitioned across ALL tasks, per-(partition, segment)
    * offset maps) and the bucket from [[PrefixPass.ntileExpr]] —
    * identical NTILE distribution, no |groups|-bounded parallelism. */
  private val q94 = Q(
    "q94_ntile_buckets",
    (s, dir) => {
      val ranked = PrefixPass.withRowNumberByGroup(
        t(s, dir, "customer"),
        Seq("c_mktsegment"),
        Seq(col("c_mktsegment").asc, col("c_acctbal").asc,
          col("c_custkey").asc),
        "rn", "n_seg")
      ranked
        .withColumn("q", PrefixPass.ntileExpr("rn", "n_seg", 4))
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
    * length), reproducible from the parquet original by the oracle.
    *
    * The writer sanitizes to the FORMAT'S ALPHABET first: a line
    * file cannot carry line terminators (Hadoop's reader splits on
    * \n, \r, and \r\n) or NULL rows, so embedded [\r\n] become
    * spaces and null docs are excluded, on both engines — without
    * this the round-trip silently multiplies rows on any corpus with
    * multi-line documents (caught by the round-12 adversarial
    * fixture; the ASCII fixtures have single-line docs only). */
  private val q100 = Q(
    "q100_text_roundtrip",
    (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_text_").toString
      t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("text"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .agg(count(lit(1)).as("n_lines"),
          asLong(sum(md5Int32(col("value")))).as("content_sum"),
          asLong(sum(length(col("value")))).as("sum_len"))
    },
    Some("""
      WITH sane AS (
        SELECT regexp_replace(text, '[\r\n]', ' ', 'g') AS text
        FROM documents WHERE text IS NOT NULL)
      SELECT COUNT(*) AS n_lines,
             CAST(SUM(('0x'||substr(md5(text),1,8))::BIGINT) AS BIGINT)
               AS content_sum,
             CAST(SUM(length(text)) AS BIGINT) AS sum_len
      FROM sane
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
          // null-guarded (q47 discipline): NULL text -> NULL n_grams
          // on both engines, not Spark's legacy size(NULL) = -1
          asLong(when(col("w").isNotNull,
            size(TextOps.shingles(col("w"), 3)))).as("n_grams"),
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

  /** Okapi BM25 relevance ranking over the corpus for a fixed query —
    * the retrieval scorer a data pipeline uses for quality-weighted
    * sampling and search-style eval sets. One pass computes per-doc
    * term frequencies and length; the corpus stats (N, avgdl, per-term
    * df) reduce to a single broadcast row; scoring is then a pure
    * projection. At scale: no shuffle beyond the one stats aggregate.
    * k1=1.2, b=0.75, IDF = ln(1 + (N-df+0.5)/(df+0.5)). */
  private val q109 = {
    val terms = Seq("merge", "sort", "tree")
    val k1 = 1.2
    val b = 0.75
    Q(
      "q109_bm25_ranking",
      (s, dir) => {
        // NULL-text docs are excluded up front on both engines: they
        // have no terms to score and their legacy size(NULL) = -1
        // "document length" would poison avgdl AND give them a
        // positive BM25 (round-12 nasty sweep)
        val tok = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), TextOps.words(col("text")).as("w"))
          .withColumn("dl", size(col("w")).cast(DoubleType))
        // materialize once: tf feeds BOTH the stats aggregate and the
        // scoring projection (a diamond plan) — without this the
        // tokenize+tf pass runs twice per action
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
        tf.crossJoin(broadcast(stats))
          .select(col("doc_id"), round(score, 4).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(10)
      },
      Some {
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
        WITH tok AS (SELECT doc_id, $w AS w FROM documents
                     WHERE text IS NOT NULL),
        tf AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfCols FROM tok),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
                         $dfCols FROM tf)
        SELECT doc_id, round($score, 4) AS bm25
        FROM tf, stats
        ORDER BY round($score, 4) DESC, doc_id LIMIT 10
        """
      })
  }

  /** Fixed-size token chunking with overlap (chunk=64 tokens,
    * stride=48 — 16-token overlap): the standard context-window
    * packing step before tokenizer/training. Pure per-row generate +
    * projection — zero shuffles, embarrassingly parallel at any
    * scale. */
  private val q110 = Q(
    "q110_token_chunking",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), col("w"),
          posexplode(
            sequence(lit(0), greatest(size(col("w")) - 1, lit(0)), lit(48)))
            .as(Seq("chunk_id", "off")))
        .withColumn("chunk", slice(col("w"), col("off") + 1, lit(64)))
        .select(col("doc_id"), asLong(col("chunk_id")).as("chunk_id"),
          asLong(col("off")).as("off"),
          // null-guarded (q47 discipline): NULL text -> one chunk row
          // with NULL n_tokens on both engines, never size(NULL) = -1
          asLong(when(col("chunk").isNotNull, size(col("chunk"))))
            .as("n_tokens"),
          array_join(slice(col("chunk"), 1, 5), " ").as("chunk_head")),
    Some("""
      WITH tok AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ') AS w
        FROM documents),
      offs AS (
        SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 48)) AS off
        FROM tok)
      SELECT doc_id, CAST(off // 48 AS BIGINT) AS chunk_id,
             CAST(off AS BIGINT) AS off,
             CAST(len(w[off+1:off+64]) AS BIGINT) AS n_tokens,
             array_to_string(w[off+1:off+5], ' ') AS chunk_head
      FROM offs
    """))

  /** PII redaction: email + phone patterns replaced with typed
    * placeholder tokens, with per-doc match counts. The corpus is
    * synthetic CS text with no PII, so a deterministic contact line is
    * appended per doc (both engines append the same line) to prove the
    * redaction fires; per-row projection, no shuffle. */
  private val q111 = Q(
    "q111_pii_redaction",
    (s, dir) => {
      // Quantifiers are BOUNDED (RFC 5321 caps the local part at 64
      // octets, domains at 255; phone numbers top out far below 30
      // chars). This is not just fidelity: Java's backtracking regex
      // is O(n²) on an unbounded greedy class over a long non-matching
      // run (each failed start re-consumes the rest of the run — the
      // adversarial fixture's 100k-char token turned this query from
      // seconds into 25+ STUCK minutes, while DuckDB's RE2 scanned it
      // linearly). Bounding the repetition caps the per-start work at
      // a constant, restoring the linear scan on any input. Both
      // engines run the identical bounded pattern.
      val emailRe =
        "[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\\.[A-Za-z]{2,16}"
      val phoneRe = "\\+?[0-9][0-9 -]{6,28}[0-9]"
      t(s, dir, "documents")
        .withColumn("aug",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1 555-01"), col("doc_id")))
        .withColumn("no_email",
          regexp_replace(col("aug"), emailRe, "<EMAIL>"))
        .withColumn("red",
          regexp_replace(col("no_email"), phoneRe, "<PHONE>"))
        .select(col("doc_id"),
          asLong(regexp_count(col("aug"), lit(emailRe))).as("n_emails"),
          asLong(regexp_count(col("no_email"), lit(phoneRe))).as("n_phones"),
          // last-60-chars via explicit arithmetic — identical clipping
          // semantics in both engines for strings shorter than 60
          expr("substring(red, greatest(length(red) - 59, 1), 60)")
            .as("redacted_tail"))
    },
    Some("""
      WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com or +1 555-01' || doc_id AS aug
        FROM documents),
      re AS (
        SELECT doc_id, aug,
               regexp_replace(aug, '[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,16}',
                              '<EMAIL>', 'g') AS no_email
        FROM aug)
      SELECT doc_id,
             CAST(len(regexp_extract_all(aug,
               '[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,16}')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(no_email,
               '\+?[0-9][0-9 -]{6,28}[0-9]')) AS BIGINT) AS n_phones,
             substring(regexp_replace(no_email, '\+?[0-9][0-9 -]{6,28}[0-9]',
                                      '<PHONE>', 'g'),
                       greatest(length(regexp_replace(no_email,
                         '\+?[0-9][0-9 -]{6,28}[0-9]', '<PHONE>', 'g')) - 59, 1),
                       60) AS redacted_tail
      FROM re
    """))

  /** Bloom-filter decontamination — q96's scale path. q96 broadcasts
    * the full benchmark shingle SET, which grows with the benchmark;
    * here the benchmark reduces to a constant-size bit array
    * (m=131072 bits as ceil(131072/63)=2081 bit_or-aggregated longs —
    * 63 positions per word to stay off the sign bit, k=3 salted-md5
    * probes), so the broadcast is ~16 KB NO MATTER how large the
    * benchmark suite gets. Every hash is md5-based, so the oracle
    * reproduces the bitmap — and therefore the exact same
    * false-positive set — bit for bit. */
  private val q113 = {
    val m = 131072L
    val k = 3
    Q(
      "q113_bloom_decontamination",
      (s, dir) => {
        def positions(gram: org.apache.spark.sql.Column) =
          array((0 until k).map(i =>
            md5Int32(concat(lit(s"$i|"), gram)) % m): _*)
        // CONTENT-GROUP grain (round-18, the q251/q253 reshape): the
        // shingle set, every probe position, and therefore n_sh /
        // n_hit / ratio are pure functions of the normalized text —
        // built once per DISTINCT content and fanned out to doc rows
        // at the very end. The bitmap side filters at MEMBERSHIP
        // grain first (grams of any content with a doc_id ≡ 0 mod
        // 97), so bitmap contents are exactly the old per-doc set.
        val base = t(s, dir, "documents")
          .withColumn("nt", TextOps.norm(col("text")))
          .filter(col("nt").isNotNull)
          .select(col("doc_id"), md5(col("nt")).as("h"), col("nt"))
        val memb = base.select(col("doc_id"), col("h")).localCheckpoint()
        val ex = ShufflePlan.pinnedByKey(
          base.select(col("h"), col("nt")), col("h"))
          .groupBy(col("h")).agg(min(col("nt")).as("nt"))
          .withColumn("sh",
            TextOps.shingleSet(split(col("nt"), " "), 8))
          .select(col("h"), asLong(size(col("sh"))).as("n_sh"),
            explode(col("sh")).as("gram"))
          .localCheckpoint()
        val seedH = memb.filter(col("doc_id") % 97 === 0)
          .select(col("h")).distinct()
        val bitmap = ex.join(seedH, Seq("h"), "left_semi")
          .select(explode(positions(col("gram"))).as("pos"))
          .select(expr("pos div 63").as("word_idx"),
            expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))")
              .as("bit"))
          .groupBy(col("word_idx"))
          .agg(expr("bit_or(bit)").as("bits"))
        val perContent = ex
          .select(col("h"), col("n_sh"), col("gram"),
            explode(positions(col("gram"))).as("pos"))
          .withColumn("word_idx", expr("pos div 63"))
          .join(broadcast(bitmap), Seq("word_idx"), "left")
          .withColumn("hit", coalesce(
            expr("(bits & shiftleft(cast(1 as bigint), cast(pos % 63 as int))) != 0"),
            lit(false)))
          .groupBy(col("h"), col("n_sh"), col("gram"))
          .agg(expr("bool_and(hit)").as("maybe"))
          .filter(col("maybe"))
          .groupBy(col("h"), col("n_sh"))
          .agg(count(lit(1)).as("n_hit"))
          .withColumn("ratio",
            round(col("n_hit").cast(DoubleType) / col("n_sh"), 6))
          .filter(col("ratio") >= 0.5)
        memb.join(perContent, "h")
          .select(col("doc_id"), col("n_sh"), col("n_hit"), col("ratio"))
      },
      Some {
        def duckPos(gramExpr: String) = (0 until k).map(i =>
          s"('0x'||substr(md5('$i|'||$gramExpr),1,8))::BIGINT % $m")
          .mkString("[", ", ", "]")
        s"""
        WITH ${duckShingles(8)},
        ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
                      unnest(sh) AS gram FROM sh),
        bpos AS (SELECT unnest(${duckPos("gram")}) AS pos
                 FROM ex WHERE doc_id % 97 = 0),
        bitmap AS (SELECT pos // 63 AS word_idx,
                          bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS bits
                   FROM bpos GROUP BY 1),
        probe AS (SELECT doc_id, n_sh, gram, unnest(${duckPos("gram")}) AS pos
                  FROM ex),
        chk AS (SELECT doc_id, n_sh, gram,
                       bool_and(COALESCE(
                         (b.bits & (1::BIGINT << CAST(pos % 63 AS INT))) != 0,
                         FALSE)) AS maybe
                FROM probe LEFT JOIN bitmap b ON pos // 63 = b.word_idx
                GROUP BY 1, 2, 3),
        hits AS (SELECT doc_id, n_sh, COUNT(*) AS n_hit
                 FROM chk WHERE maybe GROUP BY 1, 2)
        SELECT doc_id, n_sh, n_hit,
               round(CAST(n_hit AS DOUBLE) / n_sh, 6) AS ratio
        FROM hits WHERE CAST(n_hit AS DOUBLE) / n_sh >= 0.5
        """
      })
  }

  /** Inverted-index construction (term -> posting list): the core
    * search/retrieval build step. One shuffle to (term, doc) term
    * frequencies; the per-term window and the stats aggregate then
    * share that partitioning (no extra exchange). Only the first 10
    * doc ids per term are collected — `collect_list` over ALL of a
    * stop-word's postings would hold unbounded per-term state at
    * scale — and sorted before joining (collect order is NOT
    * deterministic). Top-50 terms under a total (df desc, term)
    * order. */
  private val q114 = Q(
    "q114_inverted_index",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      val byTerm = Window.partitionBy(col("term")).orderBy(col("doc_id"))
      tok.groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("rn", row_number().over(byTerm))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"), asLong(sum(col("tf"))).as("total_tf"),
          array_join(transform(
            array_sort(collect_list(when(col("rn") <= 10, col("doc_id")))),
            x => x.cast(StringType)), ",").as("postings_head"))
        .orderBy(col("df").desc, col("term"))
        .limit(50)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')) AS term
        FROM documents),
      tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
      SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
             array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',')
               AS postings_head
      FROM tf GROUP BY 1 ORDER BY df DESC, term LIMIT 50
    """))

  /** Snapshot diff (CDC-style dataset versioning): full outer join of
    * two table versions on the key, classifying every key as
    * added/removed/changed/unchanged plus the net money delta per
    * class — the audit step between two pipeline runs. Versions are
    * derived deterministically from the orders table (different modulo
    * filters; changed rows get +10.00) so both engines diff identical
    * inputs. Exact DECIMAL(18,2) arithmetic throughout. */
  private val q115 = Q(
    "q115_snapshot_diff",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey").as("k"),
          dec2(col("o_totalprice")).as("price_a"))
      val b = o.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 0,
            dec2(col("o_totalprice")) + dec2(lit(10)))
            .otherwise(dec2(col("o_totalprice"))).as("price_b"))
      a.join(b, Seq("k"), "full_outer")
        .withColumn("status",
          when(col("price_a").isNull, "added")
            .when(col("price_b").isNull, "removed")
            .when(col("price_a") =!= col("price_b"), "changed")
            .otherwise("unchanged"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          (sum(coalesce(col("price_b"), dec2(lit(0))) -
            coalesce(col("price_a"), dec2(lit(0)))))
            .cast(DoubleType).as("net_delta"))
    },
    Some("""
      WITH a AS (SELECT o_orderkey AS k,
                        CAST(o_totalprice AS DECIMAL(18,2)) AS price_a
                 FROM orders WHERE o_orderkey % 11 != 0),
      b AS (SELECT o_orderkey AS k,
                   CASE WHEN o_orderkey % 5 = 0
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                             + CAST(10 AS DECIMAL(18,2))
                        ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price_b
            FROM orders WHERE o_orderkey % 13 != 0),
      d AS (SELECT CASE WHEN price_a IS NULL THEN 'added'
                        WHEN price_b IS NULL THEN 'removed'
                        WHEN price_a != price_b THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   COALESCE(price_b, CAST(0 AS DECIMAL(18,2)))
                     - COALESCE(price_a, CAST(0 AS DECIMAL(18,2))) AS delta
            FROM a FULL OUTER JOIN b USING (k))
      SELECT status, COUNT(*) AS n,
             CAST(SUM(delta) AS DOUBLE) AS net_delta
      FROM d GROUP BY 1
    """))

  /** Length-bucketed inference batching: group documents into
    * token-length buckets (16-token-wide, capped at 8) and report each
    * bucket's padding waste — the fraction of a padded batch that is
    * padding if every doc pads to the bucket max. The metric that
    * decides whether an inference fleet needs length-aware batching.
    * Integer bucketing, exact aggregates, one shuffle. */
  private val q120 = Q(
    "q120_length_buckets",
    (s, dir) =>
      t(s, dir, "documents")
        // null-guarded (q47 discipline): NULL text -> NULL n_tokens.
        // Both engines' least() then SKIPS the null, so an
        // unmeasurable doc lands in the top (capped) bucket with a
        // NULL token contribution — engine-identical by construction
        .select(col("doc_id"),
          when(col("text").isNotNull,
            size(TextOps.words(col("text")))).cast(LongType).as("n_tokens"))
        .withColumn("bucket", least(expr("n_tokens div 16"), lit(8L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_tokens")).as("max_tokens"),
          asLong(sum(col("n_tokens"))).as("sum_tokens"))
        .withColumn("padding_waste",
          round(lit(1.0) - col("sum_tokens").cast(DoubleType) /
            (col("n_docs") * col("max_tokens")), 6)),
    Some("""
      WITH tok AS (
        SELECT doc_id,
               CAST(len(string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')) AS BIGINT)
                 AS n_tokens
        FROM documents),
      b AS (SELECT doc_id, n_tokens,
                   least(n_tokens // 16, 8) AS bucket FROM tok)
      SELECT bucket, COUNT(*) AS n_docs, MAX(n_tokens) AS max_tokens,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             round(1.0 - CAST(SUM(n_tokens) AS DOUBLE) /
                   (COUNT(*) * MAX(n_tokens)), 6) AS padding_waste
      FROM b GROUP BY 1
    """))

  /** URL canonicalization + dedup: normalize scheme/host case and
    * strip trailing slashes before grouping — the crawl-dedup step
    * that catches the same page fetched under cosmetically different
    * URLs. URLs are synthesized deterministically per doc (the corpus
    * has no URL column), with collisions and case/slash variants by
    * construction; both engines build identical inputs. */
  private val q121 = Q(
    "q121_url_dedup",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("url",
          concat(
            when(col("doc_id") % 3 === 0, "HTTPS://WWW.Example")
              .otherwise("https://www.example"),
            (col("doc_id") % 7).cast(StringType),
            lit(".com/page/"), (col("doc_id") % 50).cast(StringType),
            when(col("doc_id") % 2 === 0, "/").otherwise("")))
        .withColumn("canonical",
          regexp_replace(lower(col("url")), "/+$", ""))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_dups"),
          min(col("doc_id")).as("keep_doc"))
        .filter(col("n_dups") > 1),
    Some("""
      WITH u AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.Example'
                     ELSE 'https://www.example' END)
               || CAST(doc_id % 7 AS VARCHAR) || '.com/page/'
               || CAST(doc_id % 50 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) AS url
        FROM documents),
      c AS (SELECT doc_id, regexp_replace(lower(url), '/+$', '') AS canonical
            FROM u)
      SELECT canonical, COUNT(*) AS n_dups, MIN(doc_id) AS keep_doc
      FROM c GROUP BY 1 HAVING COUNT(*) > 1
    """))

  /** Count-min-sketch heavy hitters — frequency estimation whose STATE
    * is constant-size no matter the corpus: d=3 hash rows x w=1024
    * buckets of plain counts. Sums are trivially mergeable, so the
    * sketch build is one map-side-combining groupBy over ≤ d*w cells —
    * at 100 TB the shuffle moves at most 3072 rows per partition,
    * versus an exact top-k whose (term, count) shuffle grows with the
    * vocabulary. The estimate for a term is the MIN over its d cells
    * (each cell only ever over-counts, never under — the CMS
    * invariant, surfaced here as `overcount >= 0` with the exact
    * count joined alongside). All hashing is salted md5
    * ([[graft.functions.Exprs.md5Int32]]), so the oracle rebuilds the
    * bit-identical sketch — including its collisions. Probe side here
    * scores every distinct term for the demo top-20; at scale you
    * probe candidate terms against the broadcast sketch. */
  private val q123 = {
    val w = 1024L // buckets per hash row
    val d = 3 // hash rows
    def positions(term: org.apache.spark.sql.Column) =
      array((0 until d).map(i =>
        md5Int32(concat(lit(s"$i|"), term)) % w): _*)
    Q(
      "q123_countmin_topk",
      (s, dir) => {
        // one occurrence row per token: feeds both the sketch build
        // and the exact-count comparison, so materialize once
        val occ = t(s, dir, "documents")
          .select(explode(TextOps.words(col("text"))).as("word"))
          .localCheckpoint()
        val cells = occ
          .select(posexplode(positions(col("word"))).as(Seq("row_i", "pos")))
          .groupBy(col("row_i"), col("pos"))
          .agg(count(lit(1)).as("cnt"))
        occ.groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
          .select(col("word"), col("n_exact"),
            posexplode(positions(col("word"))).as(Seq("row_i", "pos")))
          .join(broadcast(cells), Seq("row_i", "pos"))
          .groupBy(col("word"), col("n_exact"))
          .agg(min(col("cnt")).as("est"))
          .orderBy(col("est").desc, col("word").asc)
          .limit(20)
          .select(col("word"), col("est"), col("n_exact"),
            (col("est") - col("n_exact")).as("overcount"))
      },
      Some {
        def duckPos(i: Int) =
          s"('0x'||substr(md5('$i|'||word),1,8))::BIGINT % $w"
        s"""
        WITH tok AS (
          SELECT unnest(string_split(regexp_replace(trim(lower(text)),'\\s+',' ','g'),' ')) AS word
          FROM documents),
        occ AS (${(0 until d).map(i =>
          s"SELECT word, $i AS row_i, ${duckPos(i)} AS pos FROM tok")
          .mkString(" UNION ALL ")}),
        cells AS (SELECT row_i, pos, COUNT(*) AS cnt
                  FROM occ GROUP BY 1, 2),
        exact AS (SELECT word, COUNT(*) AS n_exact FROM tok GROUP BY 1),
        probe AS (${(0 until d).map(i =>
          s"SELECT word, n_exact, $i AS row_i, ${duckPos(i)} AS pos FROM exact")
          .mkString(" UNION ALL ")}),
        est AS (SELECT word, n_exact, MIN(cnt) AS est
                FROM probe JOIN cells USING (row_i, pos)
                GROUP BY 1, 2)
        SELECT word, est, n_exact, est - n_exact AS overcount
        FROM est ORDER BY est DESC, word ASC LIMIT 20
      """})
  }

  /** Unigram-entropy quality score: H = ln(n) - (sum tf*ln tf)/n over
    * each document's token distribution — the standard "repetitive
    * slop" detector (a doc that repeats one phrase scores near 0; rich
    * text scores near ln(n_tokens)). One narrow groupBy chain per doc,
    * no joins, no shuffle beyond the per-doc aggregate; ln() rounds to
    * 4 places on both engines (q109 discipline). */
  private val q125 = Q(
    "q125_entropy_quality",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id"))
        .agg(asLong(sum(col("tf"))).as("n_tokens"),
          sum(col("tf").cast(DoubleType) * log(col("tf"))).as("s"))
        .select(col("doc_id"), col("n_tokens"),
          round(log(col("n_tokens")) - col("s") / col("n_tokens"), 4)
            .as("entropy"))
        .withColumn("low_entropy", col("entropy") < 3.0),
    Some("""
      WITH terms AS (
        SELECT doc_id,
               unnest(string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')) AS w
        FROM documents),
      tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      agg AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                     SUM(CAST(tf AS DOUBLE) * ln(tf)) AS s
              FROM tf GROUP BY 1)
      SELECT doc_id, n_tokens,
             round(ln(n_tokens) - s / n_tokens, 4) AS entropy,
             round(ln(n_tokens) - s / n_tokens, 4) < 3.0 AS low_entropy
      FROM agg
    """))

  /** Target-mixture resampling: reshape the corpus toward a uniform
    * source mixture. Per-source rate = min(1, total/(k·n_src)) —
    * overrepresented sources are downsampled to the uniform share,
    * underrepresented ones kept whole — applied as a deterministic
    * md5 parts-per-million threshold (never `rand()`: the kept set is
    * identical across runs, engines, and cluster sizes, and stable
    * under appends). The rate table is k rows → broadcast; the corpus
    * side filters map-side with no shuffle, so at 100 TB this is one
    * scan + one tiny aggregate. */
  private val q127 = Q(
    "q127_domain_mixture",
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      // the per-source counts feed the total AND the rate table —
      // checkpoint the (source-dimension) counts or both consumers
      // re-scan the corpus (round-6 plan audit)
      val counts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_before"))
        .localCheckpoint()
      val totals = counts.agg(asLong(sum(col("n_before"))).as("total"),
        count(lit(1)).as("k"))
      val rates = counts.crossJoin(broadcast(totals))
        .withColumn("rate_ppm",
          floor(least(lit(1.0),
            col("total").cast(DoubleType) / (col("k") * col("n_before")))
            * 1000000).cast(LongType))
        .select(col("source"), col("n_before"), col("rate_ppm"))
      docs.join(broadcast(rates), "source")
        .filter(md5Int32(col("doc_id").cast(StringType)) % 1000000
          < col("rate_ppm"))
        .groupBy(col("source"), col("n_before"), col("rate_ppm"))
        .agg(asLong(count(lit(1))).as("n_after"))
        .select(col("source"), col("n_before"), col("rate_ppm"),
          col("n_after"))
    },
    Some("""
      WITH c AS (SELECT source, COUNT(*) AS n_before
                 FROM documents GROUP BY 1),
      t AS (SELECT CAST(SUM(n_before) AS BIGINT) AS total, COUNT(*) AS k
            FROM c),
      r AS (SELECT source, n_before,
                   CAST(FLOOR(LEAST(1.0,
                     CAST(total AS DOUBLE) / (k * n_before)) * 1000000)
                     AS BIGINT) AS rate_ppm
            FROM c CROSS JOIN t)
      SELECT r.source, r.n_before, r.rate_ppm,
             CAST(COUNT(*) AS BIGINT) AS n_after
      FROM documents d JOIN r ON d.source = r.source
      WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
            % 1000000 < rate_ppm
      GROUP BY 1, 2, 3
    """))

  /** Sequence packing: concatenate documents (in a deterministic
    * hash order) and chunk the token stream into fixed 256-token
    * training sequences — the standard LLM-pretraining packing, where
    * a document may straddle a sequence boundary. Packing is done
    * within 16 hash shards (window cumsum partitioned by shard), never
    * over a global order: a single-partition global window would
    * serialize at 100 TB, while shard-local packing matches how
    * per-worker packers actually run and keeps every window partition
    * parallel. Reports per-shard packing stats including how many docs
    * split across a boundary. */
  private val q128 = Q(
    "q128_sequence_packing",
    (s, dir) => {
      val budget = 256
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          // null-guarded (q47 discipline): a NULL doc contributes NULL
          // to the shard's token mass on both engines, never -1
          asLong(when(col("text").isNotNull,
            size(TextOps.words(col("text"))))).as("n_tok"),
          (md5Int32(col("doc_id").cast(StringType)) % 16).as("shard"))
      val w = Window.partitionBy(col("shard"))
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("cum_end", sum(col("n_tok")).over(w))
        .withColumn("splits",
          expr(s"(cum_end - n_tok) div $budget != (cum_end - 1) div $budget"))
        .groupBy(col("shard"))
        .agg(asLong(count(lit(1))).as("n_docs"),
          asLong(sum(col("n_tok"))).as("total_tokens"),
          asLong(expr(s"(sum(n_tok) - 1) div $budget + 1")).as("n_seqs"),
          asLong(sum(col("splits").cast(IntegerType))).as("n_split_docs"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id,
               CAST(len(string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ')) AS BIGINT) AS n_tok,
               ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
                 % 16 AS shard
        FROM documents),
      c AS (SELECT shard, n_tok,
                   SUM(n_tok) OVER (PARTITION BY shard
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum_end
            FROM tok)
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             CAST((SUM(n_tok) - 1) // 256 + 1 AS BIGINT) AS n_seqs,
             CAST(SUM(CASE WHEN (cum_end - n_tok) // 256
                                != (cum_end - 1) // 256
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
      FROM c GROUP BY 1
    """))

  /** Corpus unigram-LM quality score: every token scores
    * ln(count(w)/N) against a language model fit on the corpus itself;
    * a document's mean log-probability flags statistical outliers
    * (corrupt text, wrong-language shards, random strings) — the
    * classic cheap stand-in for perplexity filtering. The vocabulary
    * is an aggregate of the same exploded tokens (one shuffle), the
    * token↔vocab join is a plain equi-join on the word — hot words
    * join 1:1 against a single vocab row, so there is no skew
    * amplification, and AQE handles the residual partition skew.
    * Per-token ln rounds to 6dp into DECIMAL(18,6) so the per-doc sum
    * is order-independent and engine-exact (q109 ln-ulp discipline);
    * output is the bottom-10 by mean log-prob under a total order. */
  private val q129 = Q(
    "q129_unigram_logprob",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      // vocab feeds the corpus total AND the scoring join — checkpoint
      // the (tiny) vocabulary table or each consumer re-runs the
      // corpus-scale tokenize+count (round-6 plan audit)
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val totals = vocab.agg(asLong(sum(col("cnt"))).as("n_total"))
      tok.join(vocab, "w")
        .crossJoin(broadcast(totals))
        .select(col("doc_id"),
          round(log(col("cnt").cast(DoubleType) / col("n_total")), 6)
            .cast(DecimalType(18, 6)).as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("lp")).as("slp"))
        .select(col("doc_id"), asLong(col("n_tok")).as("n_tok"),
          round(col("slp").cast(DoubleType) / col("n_tok"), 4)
            .as("mean_logprob"))
        .orderBy(col("mean_logprob").asc, col("doc_id").asc)
        .limit(10)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ')) AS w
        FROM documents),
      vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
      t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
      lp AS (SELECT doc_id,
                    CAST(round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
                      AS DECIMAL(18,6)) AS lp
             FROM tok JOIN vocab USING (w) CROSS JOIN t)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS mean_logprob
      FROM lp GROUP BY 1
      ORDER BY mean_logprob ASC, doc_id ASC LIMIT 10
    """))

  /** Per-language quantile quality gate: keep documents at or above
    * their own language's 25th-percentile token count — relative
    * thresholds per stratum, not one global cutoff (a global cutoff
    * would gut low-resource languages whose documents run shorter).
    * The threshold table is one exact interpolated percentile per
    * language (groupBy agg, |langs| rows) broadcast back onto the
    * corpus, so the filter itself is map-side — one scan + one tiny
    * aggregate at 100 TB. Exact percentile matches DuckDB's
    * quantile_cont bit-for-bit (q74 discipline). */
  private val q131 = Q(
    "q131_quantile_filter",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          // null-guarded (q47 discipline): a NULL doc must not poison
          // the language's 25th percentile with a -1 (both engines'
          // percentile skips NULL)
          asLong(when(col("text").isNotNull,
            size(TextOps.words(col("text"))))).as("n_tok"))
      val thr = docs.groupBy(col("lang"))
        .agg(percentile(col("n_tok"), lit(0.25)).as("thr"),
          asLong(count(lit(1))).as("n_before"))
      docs.join(broadcast(thr), "lang")
        .filter(col("n_tok").cast(DoubleType) >= col("thr"))
        .groupBy(col("lang"), col("n_before"), col("thr"))
        .agg(asLong(count(lit(1))).as("n_after"),
          asLong(sum(col("n_tok"))).as("kept_tokens"))
        .select(col("lang"), col("n_before"), col("thr"),
          col("n_after"), col("kept_tokens"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, lang,
               CAST(len(string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ')) AS BIGINT) AS n_tok
        FROM documents),
      thr AS (SELECT lang, quantile_cont(n_tok, 0.25) AS thr,
                     CAST(COUNT(*) AS BIGINT) AS n_before
              FROM tok GROUP BY 1)
      SELECT lang, n_before, thr,
             CAST(COUNT(*) AS BIGINT) AS n_after,
             CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
      FROM tok JOIN thr USING (lang)
      WHERE CAST(n_tok AS DOUBLE) >= thr
      GROUP BY 1, 2, 3
    """))

  /** Gopher-style rule funnel: the classic pretraining quality gates
    * (document length, mean word length in [3,10], minimum stop-word
    * evidence, single-token domination) evaluated as ONE conditional
    * aggregate — per-rule rejection counts plus the pass-all count,
    * the observability a pipeline needs to see WHICH rule is eating
    * its corpus. All rule arithmetic is integer-exact (cross-
    * multiplied ratios, never float division), so the verdicts are
    * engine- and order-independent. The only shuffle is the per-doc
    * top-token count; the final funnel is a single-row aggregate. */
  private val q132 = Q(
    "q132_gopher_rules",
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in")
      val d = t(s, dir, "documents")
        .withColumn("norm", TextOps.norm(col("text")))
        .select(col("doc_id"),
          size(split(col("norm"), " ")).as("n"),
          (length(col("norm")) - (size(split(col("norm"), " ")) - 1))
            .as("tc"),
          TextOps.vocabHits(split(col("norm"), " "), stop).as("stop_hits"))
      val rep = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("max_tok"))
      d.join(rep, "doc_id")
        .select(
          (col("n") < 25).cast(IntegerType).as("f_short"),
          (col("tc") < col("n") * 3 || col("tc") > col("n") * 10)
            .cast(IntegerType).as("f_mwl"),
          (col("stop_hits") < 2).cast(IntegerType).as("f_stop"),
          (col("max_tok") * 8 > col("n")).cast(IntegerType).as("f_rep"))
        .agg(asLong(count(lit(1))).as("n_docs"),
          asLong(sum(col("f_short"))).as("fail_short"),
          asLong(sum(col("f_mwl"))).as("fail_mean_word_len"),
          asLong(sum(col("f_stop"))).as("fail_stopwords"),
          asLong(sum(col("f_rep"))).as("fail_repetition"),
          asLong(sum(
            ((col("f_short") + col("f_mwl") + col("f_stop") + col("f_rep"))
              === 0).cast(IntegerType))).as("pass_all"))
    },
    Some("""
      WITH t AS (SELECT doc_id,
                        regexp_replace(trim(lower(text)),'\s+',' ','g') AS norm
                 FROM documents),
      d AS (SELECT doc_id,
                   len(string_split(norm,' ')) AS n,
                   len(norm) - (len(string_split(norm,' ')) - 1) AS tc,
                   len(list_filter(string_split(norm,' '),
                     x -> x IN ('the','a','of','and','to','in'))) AS stop_hits
            FROM t),
      rep AS (SELECT doc_id, MAX(c) AS max_tok
              FROM (SELECT doc_id, w, COUNT(*) AS c
                    FROM (SELECT doc_id, unnest(string_split(norm,' ')) AS w
                          FROM t)
                    GROUP BY 1, 2)
              GROUP BY 1),
      flags AS (SELECT
          CASE WHEN n < 25 THEN 1 ELSE 0 END AS f_short,
          CASE WHEN tc < n * 3 OR tc > n * 10 THEN 1 ELSE 0 END AS f_mwl,
          CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END AS f_stop,
          CASE WHEN max_tok * 8 > n THEN 1 ELSE 0 END AS f_rep
        FROM d JOIN rep USING (doc_id))
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(f_short) AS BIGINT) AS fail_short,
             CAST(SUM(f_mwl) AS BIGINT) AS fail_mean_word_len,
             CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
             CAST(SUM(f_rep) AS BIGINT) AS fail_repetition,
             CAST(SUM(CASE WHEN f_short + f_mwl + f_stop + f_rep = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
      FROM flags
    """))

  /** Domain-shift detection: KL divergence of each source's unigram
    * distribution from the corpus-wide distribution — the cheap
    * monitor for "this shard is not like the others" (wrong-language
    * dumps, template spam, schema drift) that a 100 TB ingest runs
    * per shard before admitting it. One token explode feeds both the
    * per-source and corpus count aggregates; the term join is equi on
    * the word against ONE corpus row per word, so hot words cause no
    * fan-out. Probabilities are integer-count ratios (engine-exact);
    * each p·ln(p/q) term rounds to 8dp DECIMAL(18,8) so the per-source
    * sum is order-independent (q109 ln-ulp discipline). */
  private val q137 = Q(
    "q137_kl_divergence",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
      // the (source, word) counts feed FOUR consumers (term join,
      // per-source totals, corpus counts, corpus total) — materialize
      // once or the tokenize+explode+aggregate runs once per consumer
      val srcCnt = tok.groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c_sw"))
        .localCheckpoint()
      val srcTot = srcCnt.groupBy(col("source"))
        .agg(sum(col("c_sw")).as("tot_s"))
      val corpCnt = srcCnt.groupBy(col("w"))
        .agg(sum(col("c_sw")).as("c_w"))
      val corpTot = corpCnt.agg(sum(col("c_w")).as("tot"))
      srcCnt.join(corpCnt, "w")
        .join(broadcast(srcTot), "source")
        .crossJoin(broadcast(corpTot))
        .select(col("source"), col("tot_s"),
          round((col("c_sw").cast(DoubleType) / col("tot_s"))
            * log((col("c_sw").cast(DoubleType) / col("tot_s"))
              / (col("c_w").cast(DoubleType) / col("tot"))), 8)
            .cast(DecimalType(18, 8)).as("term"))
        .groupBy(col("source"), col("tot_s"))
        .agg(sum(col("term")).as("kl"))
        .select(col("source"), asLong(col("tot_s")).as("n_tokens"),
          round(col("kl").cast(DoubleType), 6).as("kl"))
    },
    Some("""
      WITH tok AS (
        SELECT source,
               unnest(string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ')) AS w
        FROM documents),
      srcCnt AS (SELECT source, w, COUNT(*) AS c_sw FROM tok GROUP BY 1,2),
      srcTot AS (SELECT source, SUM(c_sw) AS tot_s FROM srcCnt GROUP BY 1),
      corpCnt AS (SELECT w, SUM(c_sw) AS c_w FROM srcCnt GROUP BY 1),
      corpTot AS (SELECT SUM(c_w) AS tot FROM corpCnt),
      terms AS (SELECT source, tot_s,
                       CAST(round((CAST(c_sw AS DOUBLE) / tot_s)
                         * ln((CAST(c_sw AS DOUBLE) / tot_s)
                           / (CAST(c_w AS DOUBLE) / tot)), 8)
                         AS DECIMAL(18,8)) AS term
                FROM srcCnt JOIN corpCnt USING (w)
                JOIN srcTot USING (source) CROSS JOIN corpTot)
      SELECT source, CAST(tot_s AS BIGINT) AS n_tokens,
             round(CAST(SUM(term) AS DOUBLE), 6) AS kl
      FROM terms GROUP BY 1, 2
    """))

  /** Incremental aggregate maintenance — the materialized-view update
    * a 100 TB pipeline runs nightly: yesterday's aggregate (the base
    * partition, pre-aggregated and stored) merges with today's delta
    * batch via a full-outer join on the group key, combining partial
    * states (counts add, decimal sums add, maxes take greatest)
    * instead of re-scanning history. The oracle computes the same
    * aggregate from scratch over base ∪ delta — asserting the merge
    * law incremental maintenance depends on: merge(agg(A), agg(B)) =
    * agg(A ∪ B). Exactness comes from mergeable state types only
    * (BIGINT counts, DECIMAL(18,2) sums, max) — a mean or a distinct
    * count would need count+sum / a sketch to merge correctly. */
  private val q140 = Q(
    "q140_incremental_agg",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      def part(f: org.apache.spark.sql.Column) = ev.filter(f)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).as("sv"),
          max(col("value")).as("mx"))
      // null-safe split: a NULL event_id fails both `% 10 === 0` and
      // `% 10 =!= 0`, which would silently drop the row from BOTH
      // partitions and break the merge law the query demonstrates
      val isDelta = coalesce(col("event_id") % 10 === 0, lit(true))
      val base = part(!isDelta)
      val delta = part(isDelta)
      base.alias("b").join(delta.alias("d"), Seq("event_type"),
          "full_outer")
        .select(col("event_type"),
          (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
            .as("n"),
          (coalesce(col("b.sv"), lit(0).cast(DecimalType(18, 2)))
            + coalesce(col("d.sv"), lit(0).cast(DecimalType(18, 2))))
            .cast(DoubleType).as("sum_value"),
          greatest(col("b.mx"), col("d.mx")).as("max_value"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             MAX(value) AS max_value
      FROM events GROUP BY 1
    """))

  /** Fuzzy key reconciliation — the dirty-dimension repair every
    * ingest hits: observed entity keys (here 32-char md5-derived
    * names, with a planted 1-char-deletion typo on every 11th
    * document's key) must re-attach to their canonical row. All-pairs
    * edit distance is O(n·m) and unshippable; candidates are blocked
    * on the 4-char key prefix (equi-join — the only fan-out is
    * prefix-bucket size), then verified with levenshtein <= 2, which
    * both engines implement as plain edit distance. Output: per
    * canonical key, how many observations attached exactly vs.
    * fuzzily — the reconciliation report a pipeline emits before
    * dropping unmatched rows. */
  private val q142 = Q(
    "q142_fuzzy_reconcile",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), md5(col("source")).as("k"))
      val obs = docs.select(col("doc_id"), col("source"),
        when(col("doc_id") % 11 === 0,
          concat(substring(col("k"), 1, 4), substring(col("k"), 6, 27)))
          .otherwise(col("k")).as("okey"))
      val canon = docs.select(col("source").as("c_source"),
        col("k").as("ckey")).distinct()
      obs.join(broadcast(canon),
          substring(col("okey"), 1, 4) === substring(col("ckey"), 1, 4) &&
            levenshtein(col("okey"), col("ckey")) <= 2)
        .groupBy(col("c_source"))
        .agg(asLong(count(lit(1))).as("n_obs"),
          asLong(sum((col("okey") === col("ckey")).cast(IntegerType)))
            .as("n_exact"),
          asLong(sum((col("okey") =!= col("ckey")).cast(IntegerType)))
            .as("n_fuzzy"))
    },
    Some("""
      WITH docs AS (SELECT doc_id, source, md5(source) AS k
                    FROM documents),
      obs AS (SELECT doc_id, source,
                     CASE WHEN doc_id % 11 = 0
                          THEN substr(k, 1, 4) || substr(k, 6, 27)
                          ELSE k END AS okey
              FROM docs),
      canon AS (SELECT DISTINCT source AS c_source, k AS ckey FROM docs)
      SELECT c_source,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CASE WHEN okey = ckey THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
             CAST(SUM(CASE WHEN okey != ckey THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fuzzy
      FROM obs JOIN canon
      ON substr(okey, 1, 4) = substr(ckey, 1, 4)
         AND levenshtein(okey, ckey) <= 2
      GROUP BY 1
    """))

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis): each document draws key = u^(1/w) from a
    * salted-md5 uniform u and weight w (token count — longer
    * documents proportionally likelier), and the sample is the global
    * top-k by key. One scan + a TakeOrderedAndProject top-k — no
    * shuffle of the corpus, no `rand()` (the same 20 documents are
    * selected on any engine, run, or cluster size, and the sample is
    * stable under appends of new doc_ids). The pow() keys round to
    * 10dp with a doc_id tiebreak so ranking is engine-exact (q109
    * ln-ulp discipline). This is the mixture-construction primitive
    * behind quality-weighted corpus sampling. */
  private val q144 = Q(
    "q144_weighted_sample",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        // null-guarded (q47 discipline): NULL text -> NULL weight ->
        // NULL key, which sorts LAST under DESC on both engines; the
        // unguarded size(NULL) = -1 gave u^(-1) > 1 and put null docs
        // at the TOP of the sample (round-12 nasty sweep)
        .select(col("doc_id"),
          asLong(when(col("text").isNotNull,
            size(TextOps.words(col("text"))))).as("w"))
      docs
        .withColumn("u",
          (md5Int32(concat(lit("ws|"), col("doc_id").cast(StringType)))
            + lit(1)).cast(DoubleType) / 4294967297.0)
        .withColumn("key", round(pow(col("u"), lit(1.0) / col("w")), 10))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(20)
        .select(col("doc_id"), col("w"), col("key"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
               CAST(len(string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ')) AS BIGINT) AS w
        FROM documents),
      keyed AS (
        SELECT doc_id, w,
               round(pow(
                 (('0x'||substr(md5('ws|'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT
                  + 1) / 4294967297.0,
                 1.0 / w), 10) AS key
        FROM docs)
      SELECT doc_id, w, key FROM keyed
      ORDER BY key DESC, doc_id ASC LIMIT 20
    """))

  /** Small-file compaction planning — the table-maintenance op every
    * lakehouse runs: given a file inventory (here each document
    * models a file, n_chars its bytes), assign files to target-sized
    * compaction bins per partition (lang) by a running-total window,
    * then emit the per-bin manifest. The exclusive prefix sum makes
    * bin boundaries first-fit deterministic; all arithmetic is
    * integer. The window is per-lang — at 100 TB the planner runs
    * over file METADATA (~10⁶ rows per partition), not data, which is
    * exactly how Iceberg/Delta compaction planning scales. */
  private val q160 = Q(
    "q160_compaction_bins",
    (s, dir) => {
      val target = 65536L
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .withColumn("prev_bytes",
          coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .withColumn("bin", expr(s"prev_bytes div $target"))
        .groupBy(col("lang"), col("bin"))
        .agg(asLong(count(lit(1))).as("n_files"),
          asLong(sum(col("n_chars"))).as("bin_bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    },
    Some("""
      WITH f AS (
        SELECT lang, doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER (PARTITION BY lang
                 ORDER BY doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prev_bytes
        FROM documents)
      SELECT lang, CAST(prev_bytes // 65536 AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM f GROUP BY 1, 2
    """))

  /** Sequence packing for LLM training (round 9, fresh number per the
    * COVERAGE numbering invariant): documents are tokenized (the q47
    * regex tokens), concatenated in doc_id order, and chunked into
    * fixed 2048-token context windows — the standard packing step that
    * turns a deduped corpus into training sequences. A document is
    * assigned to the pack holding its FIRST token (documents may span
    * pack boundaries; nothing is padded or dropped), so pack identity
    * is pure prefix arithmetic over the exclusive running token total:
    * `pack_id = (cum_tok - n_tok) div 2048`. Zero-token documents
    * (empty/whitespace-only text) are excluded up front — they carry
    * no tokens to pack, and keeping them would let a trailing
    * zero-token doc on an exact 2048 boundary mint a phantom pack
    * absent from q217's manifest (which also filters n_tok > 0); the
    * two queries' pack sets are identical by construction. The
    * running total is
    * [[PrefixPass.cumSumDecimal]] — the packing order is a total order
    * on doc_id and the corpus grows with the fact data, so the
    * distributed prefix pass (never an unpartitioned window) is the
    * scale path; the per-pack rollup then shuffles on pack_id like any
    * aggregation. Output: one row per pack with its document span and
    * the token mass of the documents starting in it.
    */
  private val q216 = {
    val PackTokens = 2048
    Q(
      "q216_sequence_packing",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .withColumn("t", TextOps.norm(col("text")))
          .select(col("doc_id"),
            regexp_count(col("t"),
              lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
              .cast(DecimalType(18, 0)).as("n_tok"))
        val (cum, _) = PrefixPass.cumSumDecimal(toks,
          Seq(col("doc_id").asc), "n_tok", "cum_tok")
        cum
          .filter(col("n_tok") > 0)
          .withColumn("pack_id",
            expr(s"CAST(cum_tok - n_tok AS BIGINT) div $PackTokens"))
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast(LongType).as("n_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id,
                 len(regexp_extract_all(
                   regexp_replace(trim(lower(text)),'\\s+',' ','g'),
                   '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tok
          FROM documents),
        cum AS (
          SELECT doc_id, n_tok,
                 SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tok
          FROM toks)
        SELECT CAST((cum_tok - n_tok) // $PackTokens AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM cum WHERE n_tok > 0 GROUP BY 1
      """))
  }

  /** The exact packing manifest q216 summarizes: per (document, pack)
    * token slices with boundary splits. A document occupying global
    * token interval [b, e) (from the same PrefixPass cumsum) spans
    * packs b div 2048 .. (e-1) div 2048; its slice inside pack p is
    * `min(e, (p+1)·2048) − max(b, p·2048)` — all 64-bit integer
    * arithmetic, so the invariant "every pack except the last carries
    * EXACTLY 2048 tokens" is checkable bit-for-bit (and is, in
    * RegistrySmokeSpec). The explode is bounded: a document emits
    * ⌈n_tok/2048⌉+1 slices, so the blow-up is ∝ corpus tokens /
    * pack size — linear in the input, never quadratic.
    */
  private val q217 = {
    val PackTokens = 2048L
    Q(
      "q217_pack_boundary_manifest",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .withColumn("t", TextOps.norm(col("text")))
          .select(col("doc_id"),
            regexp_count(col("t"),
              lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
              .cast(DecimalType(18, 0)).as("n_tok"))
        val (cum, _) = PrefixPass.cumSumDecimal(toks,
          Seq(col("doc_id").asc), "n_tok", "cum_tok")
        cum
          .filter(col("n_tok") > 0)
          .withColumn("e", col("cum_tok").cast(LongType))
          .withColumn("b", col("e") - col("n_tok").cast(LongType))
          .withColumn("pack_id", explode(sequence(
            expr(s"b div $PackTokens"), expr(s"(e-1) div $PackTokens"))))
          .withColumn("tok_in",
            least(col("e"), (col("pack_id") + 1) * PackTokens) -
              greatest(col("b"), col("pack_id") * PackTokens))
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("n_slices"),
            sum(col("tok_in")).as("n_tokens"),
            sum(when(col("b") < col("pack_id") * PackTokens, 1L)
              .otherwise(0L)).as("n_carryover_docs"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id,
                 len(regexp_extract_all(
                   regexp_replace(trim(lower(text)),'\\s+',' ','g'),
                   '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tok
          FROM documents),
        cum AS (
          SELECT doc_id, n_tok,
                 SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tok
          FROM toks),
        sp AS (
          SELECT doc_id, CAST(cum_tok AS BIGINT) AS e,
                 CAST(cum_tok - n_tok AS BIGINT) AS b
          FROM cum WHERE n_tok > 0),
        ex AS (
          SELECT doc_id, b, e,
                 unnest(range(b // $PackTokens, (e-1) // $PackTokens + 1))
                   AS pack_id
          FROM sp)
        SELECT pack_id, COUNT(*) AS n_slices,
               CAST(SUM(LEAST(e, (pack_id+1)*$PackTokens)
                        - GREATEST(b, pack_id*$PackTokens)) AS BIGINT)
                 AS n_tokens,
               CAST(SUM(CASE WHEN b < pack_id*$PackTokens THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_carryover_docs
        FROM ex GROUP BY 1
      """))
  }

  /** Chunk-grain retrieval with document-level dedup — the serving
    * query a RAG stack actually runs: q110's overlapping 64-token
    * chunks scored by q109's Okapi BM25 (same k1/b/IDF, stats at
    * CHUNK grain — N = chunks, avgdl = chunk length), top-20 chunks
    * shortlisted, then deduped to the best chunk per document and the
    * top-5 documents returned. Retrieval at chunk grain beats doc
    * grain (a long document's one relevant passage isn't diluted by
    * its length), but without the dedup step one hot document's
    * overlapping chunks fill the whole context window — this query IS
    * that dedup step.
    *
    * Scale shape: chunking + scoring are one generate + projection
    * against a broadcast 1-row stats frame (the q109 shape, zero extra
    * shuffles); the shortlist is a TakeOrderedAndProject; dedup and
    * final ranking run on the 20-row shortlist. */
  private val q268 = {
    val terms = Seq("merge", "sort", "tree")
    val k1 = 1.2
    val b = 0.75
    Q(
      "q268_chunk_retrieval",
      (s, dir) => {
        val chunks = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), TextOps.words(col("text")).as("w"))
          .select(col("doc_id"), col("w"),
            posexplode(sequence(lit(0),
              greatest(size(col("w")) - 1, lit(0)), lit(48)))
              .as(Seq("chunk_id", "off")))
          .withColumn("c", slice(col("w"), col("off") + 1, lit(64)))
          .select(col("doc_id"), asLong(col("chunk_id")).as("chunk_id"),
            col("c"), size(col("c")).cast(DoubleType).as("dl"))
        val tf = terms.zipWithIndex.foldLeft(chunks) { case (d, (term, i)) =>
          d.withColumn(s"tf$i",
            size(filter(col("c"), x => x === term)).cast(DoubleType))
        }.drop("c").localCheckpoint()
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
        val top = tf.crossJoin(broadcast(stats))
          .select(col("doc_id"), col("chunk_id"),
            round(score, 4).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"), col("chunk_id"))
          .limit(20)
        top.groupBy(col("doc_id"))
          .agg(max(struct(col("bm25"),
            (lit(0L) - col("chunk_id")).as("nc"))).as("best"))
          .select(col("doc_id"),
            (lit(0L) - col("best.nc")).as("chunk_id"),
            col("best.bm25").as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(5)
      },
      Some {
        val w = """string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),' ')"""
        val tfCols = terms.zipWithIndex.map { case (term, i) =>
          s"CAST(len(list_filter(c, x -> x = '$term')) AS DOUBLE) AS tf$i"
        }.mkString(", ")
        val dfCols = terms.indices.map(i =>
          s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * ${k1 + 1}) / " +
            s"(tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))")
          .mkString(" + ")
        s"""
        WITH tok AS (SELECT doc_id, $w AS w FROM documents
                     WHERE text IS NOT NULL),
        offs AS (
          SELECT doc_id, w,
                 unnest(range(0, greatest(len(w), 1), 48)) AS off
          FROM tok),
        ch AS (
          SELECT doc_id, CAST(off // 48 AS BIGINT) AS chunk_id,
                 w[off+1:off+64] AS c
          FROM offs),
        tf AS (SELECT doc_id, chunk_id, CAST(len(c) AS DOUBLE) AS dl,
                      $tfCols FROM ch),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
                         $dfCols FROM tf),
        top AS (
          SELECT doc_id, chunk_id, round($score, 4) AS bm25
          FROM tf, stats
          ORDER BY round($score, 4) DESC, doc_id, chunk_id LIMIT 20),
        best AS (
          SELECT doc_id, chunk_id, bm25 FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY bm25 DESC, chunk_id) AS rn FROM top)
          WHERE rn = 1)
        SELECT doc_id, chunk_id, bm25
        FROM best ORDER BY bm25 DESC, doc_id LIMIT 5
        """
      })
  }

  /** Time-travel over the CDC change log (round-15 advice #6): the
    * lakehouse family (merge-upsert q98, snapshot diff q115/q116, SCD2
    * q149, compaction q160) could diff and replay versions but never
    * RECONSTRUCT one — "the table AS OF change-sequence k" is the
    * query a debugging/reproducibility workflow actually asks.
    *
    * Reconstruction is one aggregation: the last change with seq ≤ k
    * per key (`max_by` — map-side-combinable constant state per key:
    * no per-key window, no sort, ONE shuffle on the key), dropping
    * keys whose last change is a delete. CdcSnapshotSpec proves the
    * lakehouse invariant that makes snapshots trustworthy:
    * replay(snapshot(k), changes k+1..max) ≡ snapshot(max).
    */
  private val q277 = Q(
    "q277_cdc_asof_snapshot",
    (s, dir) => {
      val log = CdcOps.changeLog(t(s, dir, "orders"))
      // AS-OF point derived from the log itself (60% through the
      // sequence space) so the query exercises mid-history
      // reconstruction at every SF; 1-row broadcast, never a shuffle
      val kAt = log.agg(expr("max(seq) * 3 div 5").as("asof_seq"))
      CdcOps.snapshotAsOf(log, kAt)
        .groupBy(col("op"), col("asof_seq"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("price")).cast(DoubleType).as("sum_price"),
          max(col("at_seq")).as("max_at_seq"))
    },
    Some(s"""
      WITH log AS (${CdcOps.changeLogSql}),
      pt AS (SELECT MAX(seq) * 3 // 5 AS asof_seq FROM log),
      last AS (
        SELECT k, asof_seq, MAX(seq) AS at_seq,
               arg_max(op, seq) AS op, arg_max(price, seq) AS price
        FROM log, pt WHERE seq <= asof_seq GROUP BY k, asof_seq)
      SELECT op, asof_seq, COUNT(*) AS n_keys,
             CAST(SUM(price) AS DOUBLE) AS sum_price,
             MAX(at_seq) AS max_at_seq
      FROM last WHERE op != 'D' GROUP BY op, asof_seq
    """))

  /** Streaming CDC upsert APPLY with out-of-order shielding, batch-
    * replay formulation (the q251/q261 discipline: the registry entry
    * is the deterministic batch replay; graft.streaming.
    * CdcApplyProcessor is the transformWithState streaming form and
    * CdcApplySpec pins the two equal on the same log). The change log
    * (q277's) arrives in micro-batches whose assignment is a
    * deterministic HASH of the sequence number — deliberately
    * scrambling arrival order so late-arriving stale changes exist —
    * and the apply rule is Delta/Debezium's: a change lands iff its
    * seq exceeds the key's applied high-water mark from EARLIER
    * batches (same-batch changes all compare against the pre-batch
    * state, the batch-boundary semantics the processor implements).
    *
    * Scale shape: ONE shuffle on the key; the high-water mark is a
    * RANGE window to the previous batch (frame rows = the key's own
    * change count, the natural CDC grain), then an 8-row batch
    * telemetry aggregate. State in the streaming form is one long per
    * key — the upsert-engine minimum. */
  private val q279 = Q(
    "q279_stream_cdc_apply",
    (s, dir) => {
      val log = CdcOps.changeLog(t(s, dir, "orders"))
        .withColumn("batch_id",
          pmod(md5Int32(col("seq").cast(StringType)), lit(8))
            .cast(LongType))
      val w = Window.partitionBy(col("k")).orderBy(col("batch_id"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val tagged = log
        .withColumn("hwm_before", max(col("seq")).over(w))
        .withColumn("stale",
          coalesce(col("seq") < col("hwm_before"), lit(false)))
      tagged.groupBy(col("batch_id"))
        .agg(asLong(count(lit(1))).as("n_changes"),
          asLong(sum(when(col("stale"), 1L).otherwise(0L)))
            .as("n_stale"),
          asLong(sum(when(!col("stale"), 1L).otherwise(0L)))
            .as("n_applied"),
          asLong(count_distinct(when(!col("stale"), col("k"))))
            .as("n_keys_updated"))
        .orderBy(col("batch_id"))
    },
    Some(s"""
      WITH log AS (${CdcOps.changeLogSql}),
      b AS (SELECT k, seq,
                   ('0x' || substr(md5(CAST(seq AS VARCHAR)), 1, 8))::BIGINT
                     % 8 AS batch_id
            FROM log),
      t AS (SELECT k, seq, batch_id,
                   MAX(seq) OVER (PARTITION BY k ORDER BY batch_id
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS hwm_before
            FROM b),
      s AS (SELECT batch_id,
                   COALESCE(seq < hwm_before, FALSE) AS stale, k
            FROM t)
      SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS n_changes,
             CAST(SUM(CASE WHEN stale THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stale,
             CAST(SUM(CASE WHEN stale THEN 0 ELSE 1 END) AS BIGINT)
               AS n_applied,
             CAST(COUNT(DISTINCT CASE WHEN NOT stale THEN k END)
               AS BIGINT) AS n_keys_updated
      FROM s GROUP BY 1 ORDER BY 1
    """))

  /** CDC checkpoint-then-truncate — the production LOG-RETENTION
    * contract (round-16 advice #5): q277 proves replay(snapshot(k),
    * tail) ≡ snapshot(max) over the FULL log, but a deployment that
    * materializes snapshot(k) then DROPS the log prefix ≤ k (retention)
    * must still be able to reconstruct any later point j > k from
    * checkpoint + truncated tail alone. The Spark side reconstructs
    * snapshot(j) from {checkpoint(k)} ∪ {log : k < seq ≤ j} — it never
    * reads the dropped prefix — while the oracle computes snapshot(j)
    * from the full log from scratch; equality IS the truncation
    * identity (CdcSnapshotSpec additionally pins it in-engine at four
    * (k, j) pairs).
    *
    * Scale shape: two 1-row broadcast cut frames, the q277 max_by hash
    * aggregate twice (checkpoint, then replay) — ONE shuffle on the
    * key each, no windows, no sort. */
  private val q285 = Q(
    "q285_cdc_checkpoint_truncate",
    (s, dir) => {
      val log = CdcOps.changeLog(t(s, dir, "orders"))
      val cuts = log.agg(
        expr("max(seq) * 2 div 5").as("ck_seq"),
        expr("max(seq) * 4 div 5").as("asof_seq"))
        .localCheckpoint()
      val ck = CdcOps.snapshotAsOf(log,
        cuts.select(col("ck_seq").as("asof_seq")))
      val tail = log.crossJoin(broadcast(cuts))
        .filter(col("seq") > col("ck_seq") &&
          col("seq") <= col("asof_seq"))
        .select(col("k"), col("seq"), col("op"), col("price"))
      CdcOps.replay(ck, tail)
        .crossJoin(broadcast(cuts))
        .groupBy(col("op"), col("ck_seq"), col("asof_seq"))
        .agg(asLong(count(lit(1))).as("n_keys"),
          sum(col("price")).cast(DoubleType).as("sum_price"),
          max(col("at_seq")).as("max_at_seq"))
        .orderBy(col("op"))
    },
    Some(s"""
      WITH log AS (${CdcOps.changeLogSql}),
      pt AS (SELECT MAX(seq) * 2 // 5 AS ck_seq,
                    MAX(seq) * 4 // 5 AS asof_seq FROM log),
      last AS (
        SELECT k, ck_seq, asof_seq, MAX(seq) AS at_seq,
               arg_max(op, seq) AS op, arg_max(price, seq) AS price
        FROM log, pt WHERE seq <= asof_seq GROUP BY k, ck_seq, asof_seq)
      SELECT op, ck_seq, asof_seq, COUNT(*) AS n_keys,
             CAST(SUM(price) AS DOUBLE) AS sum_price,
             MAX(at_seq) AS max_at_seq
      FROM last WHERE op != 'D' GROUP BY op, ck_seq, asof_seq
      ORDER BY op
    """))

  val registry: Seq[Q] =
    Seq(q89, q90, q91, q92, q93, q94, q95, q96, q97, q98, q100, q107,
      q109, q110, q111, q113, q114, q115, q120, q121, q123, q125,
      q127, q128, q129, q131, q132, q137, q140, q142, q144, q160, q216,
      q217, q268, q277, q279, q285)
}

/** The CDC change-log algebra behind q277, factored out so
  * CdcSnapshotSpec can prove the replay-equivalence invariant on the
  * exact code the registry query runs.
  *
  * The log is derived deterministically from the orders table (the
  * q115 versioning discipline — both engines build identical inputs):
  * every key k inserts at seq 3k; keys divisible by 3 are updated
  * (+10.00) at 3k+1; keys divisible by 7 are deleted at 3k+2. Unique
  * seq per (key, change), monotone within a key — the shape a Debezium
  * / Delta change feed guarantees. Money stays in DECIMAL(18,2) space
  * end to end (delete rows carry 0.00, never NULL: DuckDB's arg_max
  * skips NULL arguments while Spark's max_by returns them — a
  * divergence trap this convention sidesteps).
  */
object CdcOps {
  import graft.functions.Exprs.dec2

  def changeLog(o: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ins = o.select((col("o_orderkey") * 3).as("seq"),
      col("o_orderkey").as("k"), lit("I").as("op"),
      dec2(col("o_totalprice")).as("price"))
    val upd = o.filter(col("o_orderkey") % 3 === 0)
      .select((col("o_orderkey") * 3 + 1).as("seq"),
        col("o_orderkey").as("k"), lit("U").as("op"),
        (dec2(col("o_totalprice")) + dec2(lit(10))).as("price"))
    val del = o.filter(col("o_orderkey") % 7 === 0)
      .select((col("o_orderkey") * 3 + 2).as("seq"),
        col("o_orderkey").as("k"), lit("D").as("op"),
        dec2(lit(0)).as("price"))
    ins.unionByName(upd).unionByName(del)
  }

  /** The DuckDB rendering of [[changeLog]] (shared by q277's oracle). */
  val changeLogSql: String = """
        SELECT o_orderkey * 3 AS seq, o_orderkey AS k, 'I' AS op,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders
        UNION ALL
        SELECT o_orderkey * 3 + 1, o_orderkey, 'U',
               CAST(o_totalprice AS DECIMAL(18,2))
                 + CAST(10 AS DECIMAL(18,2))
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey * 3 + 2, o_orderkey, 'D',
               CAST(0 AS DECIMAL(18,2))
        FROM orders WHERE o_orderkey % 7 = 0"""

  /** Live table state AS OF the 1-row frame `kAt`'s `asof_seq`: the
    * latest change per key with seq ≤ asof_seq, minus keys whose
    * latest change is a delete. One hash aggregate — max/max_by state
    * is constant per key, so partial aggregation combines map-side and
    * the single shuffle carries one slim row per key. */
  def snapshotAsOf(log: org.apache.spark.sql.DataFrame,
      kAt: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    log.crossJoin(broadcast(kAt))
      .filter(col("seq") <= col("asof_seq"))
      .groupBy(col("k"), col("asof_seq"))
      .agg(max(col("seq")).as("at_seq"),
        max_by(col("op"), col("seq")).as("op"),
        max_by(col("price"), col("seq")).as("price"))
      .filter(col("op") =!= "D")

  /** Replay a change-log tail on top of a snapshot: snapshot rows
    * re-enter the resolution at their recorded seq, tail changes win
    * per key whenever newer. The same aggregate as [[snapshotAsOf]] —
    * which is exactly why replay(snapshot(k), tail) ≡ snapshot(max)
    * (CdcSnapshotSpec pins it). */
  def replay(snap: org.apache.spark.sql.DataFrame,
      tail: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    snap.select(col("k"), col("at_seq").as("seq"), col("op"),
        col("price"))
      .unionByName(tail.select(col("k"), col("seq"), col("op"),
        col("price")))
      .groupBy(col("k"))
      .agg(max(col("seq")).as("at_seq"),
        max_by(col("op"), col("seq")).as("op"),
        max_by(col("price"), col("seq")).as("price"))
      .filter(col("op") =!= "D")
}
