package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.Exprs.{asLong, dec2, md5Int32}
import graft.functions.TextOps

/** Round-6 wave: corpus-quality / data-layout operators a 100 TB
  * training-data pipeline runs continuously — distribution-drift
  * detection between corpus slices (total-variation, the exact-integer
  * complement of q137's rounded-log KL divergence), corpus-relative
  * vocabulary-coverage quality (a different axis from q125's entropy
  * and q129's unigram log-prob: no logs, so the whole score stays in
  * exact integer/ratio space), and the z-order-vs-linear PRUNING
  * DECISION (q122 computes the z-layout's stats table; this measures
  * the read amplification those stats buy against a single-column
  * sort for a 2-D box query). The reference has no analogue for any
  * of these (its aggregation surface is one group-count,
  * spark_model_trainer.py:151-156); they are engine extensions in the
  * SURVEY §2.11 tier.
  *
  * Exactness discipline: every metric that crosses the oracle boundary
  * is either a 64-bit integer, an exact decimal, or a double produced
  * by ONE division/interpolation of integers both engines compute
  * identically (cross-multiplied comparisons everywhere else), so the
  * driver's hash-compare is bit-exact despite "statistical" outputs.
  */
object QualityQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  private def tokens(s: SparkSession, dir: String, cols: Column*): DataFrame =
    t(s, dir, "documents")
      .select(cols :+ explode(split(col("text"), " ")).as("w"): _*)
      .filter(col("w") =!= "")

  /** Corpus-drift detection: per-source total-variation distance between
    * the source's unigram distribution and the whole-corpus
    * distribution — the standard "did this crawl slice shift?" monitor
    * in a training-data pipeline.
    *
    * TV = 1/2 Σ_w |p_src(w) − p_corpus(w)| is computed in INTEGER
    * cross-multiplied space: Σ|c_sw·N − c_w·n_s| as BIGINT (exact on
    * any engine), divided once at the end — both engines divide the
    * same two integers, so even the double is bit-identical. One
    * corpus-scale shuffle total: the (source, word) counts are computed
    * once and the word / source / corpus marginals all derive from that
    * vocabulary-sized table (at 100 TB: one map-side-combined
    * aggregation over the corpus, then dimension-table algebra — the
    * source×vocab grid is |sources|·|vocab| rows, millions at web
    * scale, never corpus-scale). BIGINT cross-products hold to
    * N·n_s < 2^63 (~3·10^9 × 3·10^9 tokens); past that the same plan
    * widens to DECIMAL(38,0).
    */
  private val q207 = Q(
    "q207_corpus_drift_tv",
    (s, dir) => {
      // the (source, word) counts feed four consumers (word marginal,
      // source marginal, corpus total, grid join) — materialize once
      // or the corpus-scale tokenize+aggregate runs once per consumer
      // (the q137 discipline; verified in the executed plan)
      val csw = tokens(s, dir, col("source"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("csw"))
        .localCheckpoint()
      val cw = csw.groupBy(col("w")).agg(sum(col("csw")).as("cw"))
      val ns = csw.groupBy(col("source")).agg(sum(col("csw")).as("ns"))
      val tot = cw.agg(sum(col("cw")).as("n"))
      val grid = ns.crossJoin(broadcast(cw))
        .join(csw, Seq("source", "w"), "left")
        .na.fill(0L, Seq("csw"))
      grid.crossJoin(broadcast(tot))
        .groupBy(col("source"))
        .agg(
          asLong(max(col("ns"))).as("n_tok"),
          asLong(sum(abs(col("csw") * col("n") - col("cw") * col("ns"))))
            .as("tv_num"),
          (sum(abs(col("csw") * col("n") - col("cw") * col("ns")))
            .cast(DoubleType) /
            ((lit(2.0) * max(col("ns"))) * max(col("n")))).as("tv"))
    },
    Some("""
      WITH tok AS (
        SELECT source, w FROM (
          SELECT source, unnest(string_split(text, ' ')) AS w
          FROM documents) WHERE w <> ''),
      csw AS (SELECT source, w, COUNT(*) AS csw FROM tok GROUP BY 1, 2),
      cw AS (SELECT w, SUM(csw) AS cw FROM csw GROUP BY 1),
      ns AS (SELECT source, SUM(csw) AS ns FROM csw GROUP BY 1),
      tot AS (SELECT SUM(cw) AS n FROM cw),
      grid AS (
        SELECT ns.source, ns.ns, cw.w, cw.cw, COALESCE(csw.csw, 0) AS csw
        FROM ns CROSS JOIN cw
        LEFT JOIN csw ON csw.source = ns.source AND csw.w = cw.w)
      SELECT g.source,
             CAST(MAX(g.ns) AS BIGINT) AS n_tok,
             CAST(SUM(ABS(g.csw*t.n - g.cw*g.ns)) AS BIGINT) AS tv_num,
             CAST(SUM(ABS(g.csw*t.n - g.cw*g.ns)) AS DOUBLE)
               / ((2.0*MAX(g.ns))*MAX(t.n)) AS tv
      FROM grid g CROSS JOIN tot t GROUP BY 1
    """))

  /** Corpus-relative document quality: out-of-core-vocabulary rate and
    * mean token frequency per document — the "rare-token gibberish"
    * quality filter, scored against the corpus's own top-16 vocabulary
    * rather than a fixed wordlist (so the filter adapts to the corpus,
    * the way real pretraining-data quality filters do). Top-20 worst
    * documents by OOV rate.
    *
    * Scale shape: one corpus-scale token aggregation builds the
    * vocabulary; the core set (top-16) and the full frequency table are
    * both vocabulary-sized and BROADCAST to the per-document pass, so
    * the per-doc scoring is map-side — no second corpus shuffle beyond
    * the doc_id aggregation. Ratios are single divisions of exact
    * BIGINTs (bit-identical across engines); the top-20 order is
    * deterministic via the (oov_rate DESC, doc_id) tiebreak.
    */
  private val q208 = Q(
    "q208_oov_quality",
    (s, dir) => {
      val tok = tokens(s, dir, col("doc_id"))
      // the frequency table feeds the core-vocab top-K AND the scoring
      // join — checkpoint the (tiny) vocabulary or both consumers
      // re-run the corpus-scale count (the q129 discipline)
      val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        .localCheckpoint()
      val core = cw.orderBy(col("cw").desc, col("w"))
        .limit(16).select(col("w"), lit(1).as("is_core"))
      tok.join(broadcast(cw), "w")
        .join(broadcast(core), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          asLong(sum(when(col("is_core").isNull, 1).otherwise(0)))
            .as("n_oov"),
          sum(col("cw")).as("sum_tf"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast(DoubleType) / col("n_tokens")).as("oov_rate"),
          (col("sum_tf").cast(DoubleType) / col("n_tokens")).as("mean_tf"))
        .orderBy(col("oov_rate").desc, col("doc_id"))
        .limit(20)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents) WHERE w <> ''),
      cw AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY 1),
      core AS (SELECT w FROM cw ORDER BY cw DESC, w LIMIT 16),
      per AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN c.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_oov,
               SUM(cw.cw) AS sum_tf
        FROM tok t
        LEFT JOIN core c ON t.w = c.w
        JOIN cw ON t.w = cw.w
        GROUP BY 1)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_oov,
             CAST(n_oov AS DOUBLE)/n_tokens AS oov_rate,
             CAST(sum_tf AS DOUBLE)/n_tokens AS mean_tf
      FROM per ORDER BY oov_rate DESC, doc_id LIMIT 20
    """))

  /** Z-order (Morton) data layout vs linear layout, measured by min/max
    * file pruning — the Delta/Iceberg OPTIMIZE ZORDER decision,
    * quantified (q122 builds the z-layout's min/max stats table; this
    * query answers the question those stats exist for): interleave 8
    * bits each of two query dimensions into a Morton code, bucket rows
    * into 64 "files" by z-range, collect per-file min/max stats
    * (exactly what parquet row-group / Delta file stats hold), and
    * report how many files and rows a 2-D box query must read under
    * each layout — z-order against the single-column sort baseline. The z-curve keeps BOTH
    * dimensions' min/max ranges tight per file, so the same stats prune
    * ~2.5× fewer rows under linear (single-column) sort — the measured
    * justification for z-ordering a 100 TB table queried on two keys.
    *
    * The Morton code is pure integer arithmetic (bit i extracted with
    * div/mod — identical semantics in Spark and DuckDB, no
    * engine-specific bit intrinsics), buckets are z div 1024 (top 3
    * bits of each dimension interleaved), and every output is a BIGINT
    * count: bit-exact across engines. Scale shape: one narrow scan,
    * map-side z computation, one 64-group aggregation per layout — the
    * stats table a real lakehouse maintains incrementally.
    */
  private val q210 = Q(
    "q210_layout_pruning",
    (s, dir) => {
      val zt = (0 until 8).map(i =>
        s"((x div ${1 << i}) % 2) * ${1L << (2 * i)}" +
          s" + ((y div ${1 << i}) % 2) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      // ONE scan serves both layouts AND the exact-match count: each
      // row contributes a (layout, bucket) pair per layout via explode,
      // the per-bucket stats aggregate is map-side-combined into
      // 2×64 groups, and rows_match = Σ per-bucket in-box counts (the
      // per-layout sums are provably equal — every matching row lives
      // in exactly one bucket of each layout). The naive formulation
      // (two stats subplans + a separate exact count) scans the fact
      // table three times; at 100 TB that is 3× scan cost for zero
      // extra information. Verified in the executed plan: one parquet
      // scan, one shuffle.
      val base = t(s, dir, "lineitem")
        .select((col("l_partkey") % 256).as("x"),
          (col("l_orderkey") % 256).as("y"))
        .withColumn("zv", expr(zt))
      val hit = col("xmin") <= 79 && col("xmax") >= 40 &&
        col("ymin") <= 139 && col("ymax") >= 100
      base
        .select(col("x"), col("y"),
          when(col("x").between(40, 79) && col("y").between(100, 139), 1L)
            .otherwise(0L).as("in_box"),
          explode(array(
            struct(lit("zorder").as("layout"),
              expr("zv div 1024").as("bucket")),
            struct(lit("linear").as("layout"),
              expr("x div 4").as("bucket")))).as("lb"))
        .select(col("x"), col("y"), col("in_box"),
          col("lb.layout").as("layout"), col("lb.bucket").as("bucket"))
        .groupBy(col("layout"), col("bucket"))
        .agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"),
          min(col("y")).as("ymin"), max(col("y")).as("ymax"),
          count(lit(1)).as("cnt"), sum(col("in_box")).as("n_match"))
        .groupBy(col("layout"))
        .agg(
          count(lit(1)).as("buckets_total"),
          asLong(sum(when(hit, 1).otherwise(0))).as("buckets_read"),
          asLong(sum(when(hit, col("cnt")).otherwise(0))).as("rows_read"),
          asLong(sum(col("n_match"))).as("rows_match"))
    },
    Some({
      val zt = (0 until 8).map(i =>
        s"((x//${1 << i})%2)*${1L << (2 * i)}" +
          s" + ((y//${1 << i})%2)*${1L << (2 * i + 1)}")
        .mkString(" + ")
      s"""
      WITH base0 AS (
        SELECT l_partkey % 256 AS x, l_orderkey % 256 AS y FROM lineitem),
      base AS (
        SELECT x, y,
               CASE WHEN x BETWEEN 40 AND 79 AND y BETWEEN 100 AND 139
                    THEN 1 ELSE 0 END AS in_box,
               ($zt)//1024 AS zbucket
        FROM base0),
      pairs AS (
        SELECT 'zorder' AS layout, zbucket AS bucket, x, y, in_box
        FROM base
        UNION ALL
        SELECT 'linear' AS layout, x//4 AS bucket, x, y, in_box
        FROM base),
      st AS (
        SELECT layout, bucket, MIN(x) xmin, MAX(x) xmax,
               MIN(y) ymin, MAX(y) ymax, COUNT(*) cnt,
               SUM(in_box) AS n_match
        FROM pairs GROUP BY 1, 2)
      SELECT layout,
             CAST(COUNT(*) AS BIGINT) AS buckets_total,
             CAST(SUM(CASE WHEN xmin<=79 AND xmax>=40 AND ymin<=139
                            AND ymax>=100 THEN 1 ELSE 0 END) AS BIGINT)
               AS buckets_read,
             CAST(SUM(CASE WHEN xmin<=79 AND xmax>=40 AND ymin<=139
                            AND ymax>=100 THEN cnt ELSE 0 END) AS BIGINT)
               AS rows_read,
             CAST(SUM(n_match) AS BIGINT) AS rows_match
      FROM st GROUP BY 1
      """
    }))

  /** Corpus-relative RANK surprisal — the ordinal, log-free axis of
    * the perplexity-filter family (CCNet-style quality pruning):
    * every word gets its global frequency RANK (1 = most frequent,
    * ties broken by word), and a document scores the exact integer
    * mean rank of its tokens in micro-units plus the fraction of
    * tokens from the rare half of the vocabulary. Complements q129
    * (unigram log-prob: real-valued, rounded, top-10 output) with a
    * score that stays in 64-bit integer space end to end — no
    * transcendentals, so the oracle hash is exact — and emits every
    * SCORABLE document, not a leaderboard. Docs with NULL text are
    * excluded BY CONTRACT on both engines (the token explode of a
    * null word array drops the doc, exactly as unnest of NULL does in
    * the oracle): a null doc has no tokens, so no mean rank exists
    * for it — a caller filtering on the score treats no-row as
    * "unscorable", the same contract as q129. (q237/q47 instead
    * null-guard because their outputs are corpus REWRITES, where
    * dropping a doc would silently change the corpus.)
    *
    * Scale: the vocabulary grows with the corpus, so the global rank
    * is [[PrefixPass.withRowNumber]] over (freq desc, word) — the
    * two-phase range-partitioned shape, never an unpartitioned
    * window; the score join re-attaches ranks to the token stream by
    * word (Zipf-skewed — AQE's skew split owns the hot words). The
    * micro-mean is computed by quotient/remainder split,
    * (s div n)·10⁶ + ((s mod n)·10⁶) div n, so the intermediate
    * never exceeds max(Σrank, n·10⁶) — overflow-safe without decimal
    * promotion on either engine. */
  private val q238 = Q(
    "q238_rank_surprisal",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val (ranked, vocabN) = PrefixPass.withRowNumber(
        vocab, Seq(col("cnt").desc, col("w").asc), "r")
      val rareCut = vocabN / 2
      tok.join(ranked.select(col("w"), col("r")), "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
          sum(when(col("r") > rareCut, 1L).otherwise(0L)).as("nr"))
        .select(col("doc_id"), asLong(col("n")).as("n_tok"),
          expr("(sr div n) * 1000000 + ((sr % n) * 1000000) div n")
            .cast(LongType).as("mean_rank_micro"),
          expr("(nr * 1000000) div n")
            .cast(LongType).as("rare_frac_micro"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split(
                 regexp_replace(trim(lower(text)),'\s+',' ','g'), ' ')) AS w
        FROM documents),
      vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
      ranked AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS r
        FROM vocab),
      v AS (SELECT COUNT(*) AS vn FROM vocab)
      SELECT doc_id, COUNT(*) AS n_tok,
             CAST((SUM(r) // COUNT(*)) * 1000000
                  + ((SUM(r) % COUNT(*)) * 1000000) // COUNT(*)
               AS BIGINT) AS mean_rank_micro,
             CAST((SUM(CASE WHEN r > (SELECT vn FROM v) // 2
                            THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
               AS BIGINT) AS rare_frac_micro
      FROM tok JOIN ranked USING (w)
      GROUP BY 1
    """))

  /** Per-source lexical-statistics panel: token/type/hapax counts,
    * type-token ratio, top-10 word coverage, and a Zipf slope fit —
    * the corpus-health numbers a data-mixing decision reads next to
    * q137's KL drift and q246's fertility (a source whose Zipf slope
    * or hapax share is off-profile is boilerplate-heavy or synthetic,
    * before any model-based score is spent on it).
    *
    * Zipf slope = OLS of ln(freq) on ln(rank) over each source's
    * top-100 words, with both logs rounded to 6 dp into DECIMAL(18,6)
    * BEFORE the sums (the q252 ln-ulp discipline — decimal sums are
    * partition-order independent and engine-exact); the one division
    * happens on the 20-row frame in identical textual order. Ratios
    * are integer micro-units.
    *
    * Scale shape: one token explode map-side combines into the
    * (source, word) vocabulary table — VOCABULARY-scale, not corpus
    * scale; the per-source rank window runs over that table (20
    * partitions of vocabulary-size rows — the q92 top-k shape, not a
    * per-document window), and everything after rn ≤ 100 is
    * driver-scale algebra. */
  private val q260 = Q(
    "q260_lexical_stats",
    (s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val stats = vocab.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tok"),
          count(lit(1)).as("n_types"),
          sum(when(col("cnt") === 1, lit(1L)).otherwise(lit(0L)))
            .as("hapax"))
      val ranked = vocab.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("cnt").desc, col("w").asc)))
        .filter(col("rn") <= 100)
        .localCheckpoint()
      val top10 = ranked.filter(col("rn") <= 10)
        .groupBy(col("source")).agg(sum(col("cnt")).as("top10"))
      val fit = ranked
        .select(col("source"),
          round(log(col("rn").cast(DoubleType)), 6)
            .cast(DecimalType(18, 6)).as("x"),
          round(log(col("cnt").cast(DoubleType)), 6)
            .cast(DecimalType(18, 6)).as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("source"), round(
          (col("k") * col("sxy").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
            (col("k") * col("sxx").cast(DoubleType) -
              col("sx").cast(DoubleType) * col("sx").cast(DoubleType)), 4)
          .as("zipf_slope"))
      stats.join(top10, "source").join(fit, "source")
        .select(col("source"), col("n_tok"), col("n_types"), col("hapax"),
          expr("(n_types * 1000000) div n_tok").as("ttr_u"),
          expr("(hapax * 1000000) div n_types").as("hapax_u"),
          expr("(top10 * 1000000) div n_tok").as("top10_cov_u"),
          col("zipf_slope"))
        .orderBy(col("source"))
    },
    Some("""
      WITH tok AS (
        SELECT source, unnest(string_split(
          regexp_replace(trim(lower(text)),'\s+',' ','g'), ' ')) AS w
        FROM documents),
      vocab AS (
        SELECT source, w, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
      stats AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tok,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hapax
        FROM vocab GROUP BY 1),
      ranked AS (
        SELECT source, cnt, rn FROM (
          SELECT source, cnt, row_number() OVER (PARTITION BY source
            ORDER BY cnt DESC, w) AS rn
          FROM vocab)
        WHERE rn <= 100),
      top10 AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS top10
        FROM ranked WHERE rn <= 10 GROUP BY 1),
      fit AS (
        SELECT source,
          round((k * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                (k * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
            AS zipf_slope
        FROM (
          SELECT source, COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM (SELECT source,
                  CAST(round(ln(CAST(rn AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS x,
                  CAST(round(ln(CAST(cnt AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS y
                FROM ranked)
          GROUP BY 1))
      SELECT source, n_tok, n_types, hapax,
             (n_types * 1000000) // n_tok AS ttr_u,
             (hapax * 1000000) // n_types AS hapax_u,
             (top10 * 1000000) // n_tok AS top10_cov_u,
             zipf_slope
      FROM stats JOIN top10 USING (source) JOIN fit USING (source)
      ORDER BY source
    """))

  /** Quality-gate ablation lattice: the 2³ pass/fail cells of three
    * independent integer-exact gates — length (n_tok ≥ 32),
    * word-repetition (duplicated-token share ≤ 0.55), mean word
    * length within [4.3, 4.7] chars — with document and token mass
    * per cell. A filtering pipeline publishes exactly this table
    * before turning gates on: it shows each gate's marginal kill
    * mass AND the overlap structure (a document failing two gates is
    * cheap to lose; a big cell failing only one gate is where a
    * threshold review pays). q48/q132 emit per-gate funnels; the
    * lattice is the joint distribution those funnels marginalize.
    *
    * Scale shape: one token pass, map-side combined into ≤8 cells;
    * every statistic is integer micro-units. */
  private val q270 = Q(
    "q270_gate_ablation",
    (s, dir) => {
      val stats = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(TextOps.words(col("text")).as("w"))
        .select(size(col("w")).cast(LongType).as("n_tok"),
          size(array_distinct(col("w"))).cast(LongType).as("n_types"),
          length(array_join(col("w"), "")).cast(LongType).as("n_chars"))
        .withColumn("dup_u",
          expr("((n_tok - n_types) * 1000000) div n_tok"))
        .withColumn("mwl_u", expr("(n_chars * 1000000) div n_tok"))
        .select(
          (col("n_tok") >= 32).as("pass_len"),
          (col("dup_u") <= 550000).as("pass_rep"),
          (col("mwl_u") >= 4300000 && col("mwl_u") <= 4700000)
            .as("pass_mwl"),
          col("n_tok"))
      val total = stats.agg(count(lit(1)).as("n_total"))
      stats.groupBy(col("pass_len"), col("pass_rep"), col("pass_mwl"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast(LongType).as("n_tokens"))
        .crossJoin(broadcast(total))
        .withColumn("share_u", expr("(n_docs * 1000000) div n_total"))
        .drop("n_total")
        .orderBy(col("pass_len"), col("pass_rep"), col("pass_mwl"))
    },
    Some("""
      WITH t AS (
        SELECT string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ') AS w
        FROM documents WHERE text IS NOT NULL),
      stats AS (
        SELECT CAST(len(w) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
               CAST(length(array_to_string(w, '')) AS BIGINT) AS n_chars
        FROM t),
      gated AS (
        SELECT n_tok >= 32 AS pass_len,
               ((n_tok - n_types) * 1000000) // n_tok <= 550000
                 AS pass_rep,
               (n_chars * 1000000) // n_tok BETWEEN 4300000 AND 4700000
                 AS pass_mwl,
               n_tok
        FROM stats),
      total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM gated)
      SELECT pass_len, pass_rep, pass_mwl,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             (CAST(COUNT(*) AS BIGINT) * 1000000) // n_total AS share_u
      FROM gated, total
      GROUP BY 1, 2, 3, n_total
      ORDER BY 1, 2, 3
    """))

  /** Quality-threshold selection curve × gate-cell composition
    * (round-14 advice #6): for every selection threshold on q250's
    * distilled rule score qs (the model's training target — the
    * oracle-exact arm of the q250 contract; the GBT's agreement with
    * it is pinned in MlQualitySpec), the kept document/token mass
    * BROKEN DOWN by q270's 2³ gate lattice cell — the table a
    * curation run reads to pick the shipped threshold: it shows not
    * just how much token mass each threshold keeps but WHAT the kept
    * mass looks like under the independent quality gates (a
    * threshold that keeps mass mostly from all-gates-fail cells is
    * selecting garbage the gates would re-kill).
    *
    * Exactness: qs is the 6-dp-rounded rule score routed to integer
    * micro-units through DECIMAL(18,6) (the q264 double→BIGINT
    * discipline); thresholds are the 10 deciles thr_u = b·100000;
    * membership (qs_u ≥ thr_u) is evaluated as integer bucket
    * algebra, never a float compare.
    *
    * Scale shape: ONE corpus token pass aggregates to ≤ 80
    * (bucket × gate-cell) rows map-side; the threshold sweep is a
    * suffix-cumulative expansion of that tiny frame (each cell emits
    * its thresholds b ≤ bucket — never a second corpus pass, never a
    * per-threshold scan); the composition share is a partitioned
    * window over ≤ 80 rows. */
  private val q274 = Q(
    "q274_selection_curve",
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in")
      val f = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(TextOps.words(col("text")).as("w"))
        .filter(col("w").isNotNull && size(col("w")) >= 1)
        .select(size(col("w")).cast(LongType).as("n_tok"),
          size(array_distinct(col("w"))).cast(LongType).as("n_types"),
          length(array_join(col("w"), "")).cast(LongType).as("n_chars"),
          round((size(array_distinct(col("w"))).cast(DoubleType) /
              size(col("w"))) * 0.4
            + (lit(1.0) - TextOps.vocabHits(col("w"), stop)
                .cast(DoubleType) / size(col("w"))) * 0.3
            + least(lit(1.0),
                size(col("w")).cast(DoubleType) / 100.0) * 0.3,
            6).as("qs"))
      val cells = f
        .withColumn("qs_u",
          (col("qs").cast(DecimalType(18, 6)) * lit(1000000))
            .cast(LongType))
        .select(
          least(expr("qs_u div 100000"), lit(9L)).as("bucket"),
          (col("n_tok") >= 32).as("pass_len"),
          (expr("((n_tok - n_types) * 1000000) div n_tok") <= 550000L)
            .as("pass_rep"),
          expr("(n_chars * 1000000) div n_tok between 4300000 and 4700000")
            .as("pass_mwl"),
          col("n_tok"))
        .groupBy(col("bucket"), col("pass_len"), col("pass_rep"),
          col("pass_mwl"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast(LongType).as("n_tokens"))
      val curve = cells
        .select(explode(sequence(lit(0L), col("bucket"))).as("b"),
          col("pass_len"), col("pass_rep"), col("pass_mwl"),
          col("n_docs"), col("n_tokens"))
        .groupBy((col("b") * 100000).as("thr_u"), col("pass_len"),
          col("pass_rep"), col("pass_mwl"))
        .agg(sum(col("n_docs")).cast(LongType).as("n_docs"),
          sum(col("n_tokens")).cast(LongType).as("n_tokens"))
      curve
        .withColumn("cell_tok_share_u",
          expr("(n_tokens * 1000000) div " +
            "sum(n_tokens) over (partition by thr_u)"))
        .orderBy(col("thr_u"), col("pass_len"), col("pass_rep"),
          col("pass_mwl"))
    },
    Some("""
      WITH t AS (
        SELECT string_split(regexp_replace(trim(lower(text)),
                 '\s+',' ','g'),' ') AS w
        FROM documents WHERE text IS NOT NULL),
      f AS (
        SELECT CAST(len(w) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
               CAST(length(array_to_string(w, '')) AS BIGINT) AS n_chars,
               round((CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.4
                 + (1.0 - CAST(len(list_filter(w,
                     x -> x IN ('the','a','of','and','to','in')))
                     AS DOUBLE) / len(w)) * 0.3
                 + LEAST(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.3,
                 6) AS qs
        FROM t WHERE len(w) >= 1),
      g AS (
        SELECT LEAST(CAST(CAST(qs AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                 // 100000, 9) AS bucket,
               n_tok >= 32 AS pass_len,
               ((n_tok - n_types) * 1000000) // n_tok <= 550000
                 AS pass_rep,
               (n_chars * 1000000) // n_tok BETWEEN 4300000 AND 4700000
                 AS pass_mwl,
               n_tok
        FROM f),
      cells AS (
        SELECT bucket, pass_len, pass_rep, pass_mwl,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM g GROUP BY 1, 2, 3, 4),
      curve AS (
        SELECT b * 100000 AS thr_u, pass_len, pass_rep, pass_mwl,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM (SELECT cells.*, unnest(range(0, bucket + 1)) AS b
              FROM cells)
        GROUP BY 1, 2, 3, 4)
      SELECT thr_u, pass_len, pass_rep, pass_mwl, n_docs, n_tokens,
             CAST((n_tokens * 1000000) //
               SUM(n_tokens) OVER (PARTITION BY thr_u)
               AS BIGINT) AS cell_tok_share_u
      FROM curve
      ORDER BY 1, 2, 3, 4
    """))

  val registry: Seq[Q] = Seq(q207, q208, q210, q238, q260, q270, q274)
}
