package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** Round-10 wave: training-SET construction — the operators that turn
  * a cleaned, deduped corpus (the q45–q52/q89–q146 pipeline output)
  * into the artifact a training run actually consumes. q216/q217 pack
  * documents into context windows; these ten cover the remaining
  * standard steps: source mixing weights q218 (temperature sampling à
  * la multilingual-corpus balancing), length-bucketed batching q219
  * with padding-waste accounting, corpus-wide duplicated-n-gram
  * coverage q220 (the exact-substring-dup telemetry of Lee et al.'s
  * "Deduplicating Training Data" — at n-gram-start granularity, which
  * keeps the pass linear), near-dup canonical selection q221 (keep
  * the best-quality representative per content cluster, not merely
  * the first), the deterministic epoch shuffle + contiguous shard
  * manifest q222, n-gram-level train/eval decontamination q223,
  * sub-document span dedup as fixed tiles q224 and content-defined
  * chunks q225, the composed end-to-end pipeline q226, and
  * deterministic negative sampling q227.
  *
  * The reference has no analogue for any of these — its only corpus
  * aggregation surface is the single group-count at
  * pyspark_app/spark_model_trainer.py:151-156 (see SURVEY §2.3); they
  * extend the SURVEY §2.11 tier.
  *
  * Exactness discipline (the hash-compare contract): every number that
  * crosses the oracle boundary is a 64-bit integer, or a double from
  * ONE division of two integers both engines computed identically, or
  * — in q218 — floor(sqrt(x)) where IEEE-754 requires sqrt to be
  * correctly rounded, so the double is bit-identical in any compliant
  * engine and its floor is engine-independent.
  */
object TrainingSetQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** Regex token count shared with q47/q216: letter runs | digit runs |
    * single punctuation over normalized text. */
  private def reTokens(c: Column): Column =
    regexp_count(TextOps.norm(c),
      lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast(LongType)

  /** Temperature-sampled source mixing (α = 1/2): the multilingual /
    * multi-domain corpus-balancing step — sampling probability
    * p_i ∝ n_i^α flattens the source distribution so small sources are
    * upsampled relative to proportional mixing. A fixed per-epoch
    * budget of 1 000 000 samples is allocated to sources by
    * largest-remainder apportionment so the allocations are WHOLE and
    * sum EXACTLY to the budget (the q165 proration discipline).
    *
    * Exactness: the weight is w_i = floor(sqrt(n_i·10¹²)) — IEEE sqrt
    * is correctly rounded, so both engines floor the SAME double into
    * the same BIGINT, and everything after (totals, floor-division
    * quotas, remainder ranks, the final one-division probability) is
    * integer arithmetic. Scale: the whole query after the one
    * corpus-scale group-count runs on the |sources| dimension table —
    * its global windows are constant-bounded (|sources| rows, ~20 in
    * the fixture; a production registry is thousands at most), the
    * shape RegistrySmokeSpec's window audit whitelists with exactly
    * that proof. Overflow: B·w_i ≤ 10⁶·10¹² = 10¹⁸ < 2⁶³.
    */
  private val q218 = {
    val Budget = 1000000L
    Q(
      "q218_temperature_mixing",
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .withColumn("w",
            floor(sqrt(col("n_docs").cast(DoubleType) * lit(1e12)))
              .cast(LongType))
        val all = Window.partitionBy()
        val rk = Window.partitionBy()
          .orderBy(col("rem").desc, col("source").asc)
        counts
          .withColumn("tot_w", sum(col("w")).over(all))
          .withColumn("floor_alloc", expr(s"($Budget * w) div tot_w"))
          .withColumn("rem", expr(s"($Budget * w) % tot_w"))
          .withColumn("deficit",
            lit(Budget) - sum(col("floor_alloc")).over(all))
          .withColumn("rk", row_number().over(rk).cast(LongType))
          .select(col("source"), col("n_docs"),
            (col("floor_alloc") +
              when(col("rk") <= col("deficit"), 1L).otherwise(0L))
              .as("alloc"),
            (col("w").cast(DoubleType) / col("tot_w").cast(DoubleType))
              .as("weight"))
      },
      Some(s"""
        WITH c AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE) * 1e12)) AS BIGINT)
                   AS w
          FROM documents GROUP BY 1),
        g AS (
          SELECT source, n_docs, w,
                 SUM(w) OVER () AS tot_w,
                 ($Budget * w) // SUM(w) OVER () AS floor_alloc,
                 ($Budget * w) % SUM(w) OVER () AS rem
          FROM c),
        r AS (
          SELECT *,
                 $Budget - SUM(floor_alloc) OVER () AS deficit,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
          FROM g)
        SELECT source, n_docs,
               CAST(floor_alloc + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc,
               CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE) AS weight
        FROM r
      """))
  }

  /** Length-bucketed batching: documents are routed to power-of-two
    * token-capacity buckets (16 … 32768, under-16 clamped up, over-cap
    * clamped into the top bucket) and the padding waste of batching
    * at each capacity — Σ(cap − n_tok) — is accounted exactly. This is
    * the pre-packing alternative q216 competes with: bucketing trades
    * zero cross-document attention for padding waste, and THIS query
    * computes that waste so the tradeoff is a measurement, not a
    * guess. The bucket ladder is a 12-branch CASE (codegen'd, no join,
    * no lookup table); everything is integer except the final
    * one-division waste ratio. One corpus-scale aggregation total.
    */
  private val q219 = {
    val caps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L,
      4096L, 8192L, 16384L, 32768L)
    Q(
      "q219_length_bucketing",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), reTokens(col("text")).as("n_tok"))
        val cap = caps.init.foldRight(lit(caps.last): Column) {
          case (c, rest) => when(col("n_tok") <= c, c).otherwise(rest)
        }
        d.withColumn("bucket_cap", cap)
          .groupBy(col("bucket_cap"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast(LongType).as("sum_tokens"),
            sum(col("bucket_cap") - least(col("n_tok"), col("bucket_cap")))
              .cast(LongType).as("padded_tokens"))
          .withColumn("waste_ratio",
            col("padded_tokens").cast(DoubleType) /
              (col("bucket_cap") * col("n_docs")).cast(DoubleType))
      },
      Some {
        val ladder = caps.init
          .map(c => s"WHEN n_tok <= $c THEN $c")
          .mkString(" ")
        s"""
        WITH toks AS (
          SELECT doc_id,
                 len(regexp_extract_all(
                   regexp_replace(trim(lower(text)),'\\s+',' ','g'),
                   '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tok
          FROM documents),
        b AS (
          SELECT n_tok,
                 CAST(CASE $ladder ELSE ${caps.last} END AS BIGINT)
                   AS bucket_cap
          FROM toks)
        SELECT bucket_cap, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               CAST(SUM(bucket_cap - LEAST(n_tok, bucket_cap)) AS BIGINT)
                 AS padded_tokens,
               CAST(SUM(bucket_cap - LEAST(n_tok, bucket_cap)) AS DOUBLE)
                 / CAST(bucket_cap * COUNT(*) AS DOUBLE) AS waste_ratio
        FROM b GROUP BY 1
        """
      })
  }

  /** Corpus-wide duplicated-8-gram coverage per source: the fraction of
    * 8-gram start positions whose shingle occurs MORE THAN ONCE in the
    * whole corpus — the linear-cost telemetry for exact substring
    * duplication (suffix-array dedup's decision input). Unlike q50
    * (pairwise doc Jaccard) and q130 (first-seen novelty), this scores
    * every token position against the global shingle multiset, so
    * boilerplate shared by MANY documents shows up at full weight.
    *
    * Shape: ONE corpus-scale shingle aggregation to (shingle, source)
    * counts — map-side combinable, shingles md5-compressed to fixed
    * width before the shuffle — then the corpus total per shingle is a
    * window partitioned BY SHINGLE over that vocabulary-scale table
    * (per-gram groups, never global; a self-join formulation would
    * recompute the corpus aggregation once per join side). No pairwise
    * fan-out anywhere; cost is Θ(corpus tokens). Sources with no
    * 8-gram (all docs shorter than 8 tokens) carry no start positions
    * and are absent by construction.
    */
  private val q220 = Q(
    "q220_dup_ngram_coverage",
    (s, dir) => {
      val grams = t(s, dir, "documents")
        .select(col("source"), TextOps.words(col("text")).as("w"))
        .select(col("source"),
          explode(TextOps.shingles(col("w"), 8)).as("g8"))
        .select(col("source"), md5(col("g8")).as("g"))
      val sg = grams.groupBy(col("g"), col("source"))
        .agg(count(lit(1)).as("c_sg"))
      sg.withColumn("c_g",
          sum(col("c_sg")).over(Window.partitionBy(col("g"))))
        .groupBy(col("source"))
        .agg(sum(col("c_sg")).cast(LongType).as("n_starts"),
          sum(when(col("c_g") > 1, col("c_sg")).otherwise(0L))
            .cast(LongType).as("dup_starts"))
        .withColumn("dup_frac",
          col("dup_starts").cast(DoubleType) /
            col("n_starts").cast(DoubleType))
    },
    Some("""
      WITH toks AS (
        SELECT source,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                 ' ') AS w
        FROM documents),
      grams AS (
        SELECT source,
               md5(unnest([array_to_string(w[i+1:i+8],' ')
                           FOR i IN range(len(w)-7)])) AS g
        FROM toks WHERE len(w) >= 8),
      sg AS (SELECT g, source, COUNT(*) AS c_sg FROM grams GROUP BY 1, 2),
      gt AS (SELECT g, SUM(c_sg) AS c_g FROM sg GROUP BY 1)
      SELECT source,
             CAST(SUM(c_sg) AS BIGINT) AS n_starts,
             CAST(SUM(CASE WHEN c_g > 1 THEN c_sg ELSE 0 END) AS BIGINT)
               AS dup_starts,
             CAST(SUM(CASE WHEN c_g > 1 THEN c_sg ELSE 0 END) AS DOUBLE)
               / CAST(SUM(c_sg) AS DOUBLE) AS dup_frac
      FROM sg JOIN gt USING (g)
      GROUP BY 1
    """))

  /** Near-dup canonical selection: within each content cluster (the
    * q46 order-independent vocabulary fingerprint — same word SET,
    * any order/multiplicity), keep the single best document by the q48
    * quality score (type-token ratio + stopword + length prior),
    * doc_id ascending as the total-order tiebreak. This is the step
    * AFTER dedup detection that q75 (keep-first) approximates: keeping
    * the first-seen duplicate discards quality information; keeping
    * the argmax preserves the best representative. Output: per-source
    * kept/dropped accounting with exact dropped-character mass.
    *
    * Shape: one window pass partitioned BY CLUSTER (never global), so
    * work distributes across clusters at any corpus size; the quality
    * score is computed per-row before the shuffle.
    */
  private val q221 = Q(
    "q221_cluster_canonical",
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in")
      val d = t(s, dir, "documents")
        .withColumn("w", TextOps.words(col("text")))
        .withColumn("fp", TextOps.fingerprint(col("text")))
      val nW = size(col("w"))
      val ttr = size(array_distinct(col("w"))).cast(DoubleType) / nW
      val stopRatio = TextOps.vocabHits(col("w"), stop).cast(DoubleType) / nW
      val lenPrior = least(lit(1.0), nW.cast(DoubleType) / 100.0)
      val q = round(ttr * 0.4 + (lit(1.0) - stopRatio) * 0.3
        + lenPrior * 0.3, 6)
      val win = Window.partitionBy(col("fp"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      d.withColumn("quality", q)
        .withColumn("rk", row_number().over(win))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(when(col("rk") === 1, 1L).otherwise(0L))
            .cast(LongType).as("n_kept"),
          sum(when(col("rk") > 1, 1L).otherwise(0L))
            .cast(LongType).as("n_dropped"),
          sum(when(col("rk") > 1, col("n_chars")).otherwise(0L))
            .cast(LongType).as("chars_dropped"))
    },
    Some("""
      WITH scored AS (
        SELECT source, doc_id, n_chars,
               md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS fp,
               round((CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.4
                 + (1.0 - CAST(len(list_filter(w,
                     x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                     / len(w)) * 0.3
                 + LEAST(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.3, 6)
                 AS quality
        FROM (SELECT source, doc_id, n_chars,
                string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                  ' ') AS w
              FROM documents)),
      rk AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY fp
                 ORDER BY quality DESC, doc_id ASC) AS rk
        FROM scored)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_dropped
      FROM rk GROUP BY 1
    """))

  /** Deterministic epoch shuffle + shard manifest: training order is a
    * pseudo-random but REPRODUCIBLE permutation — sort by the salted
    * md5 of the document id ("epoch1|<id>"; a new epoch = a new salt =
    * an independent permutation) — sliced into 64 contiguous,
    * balanced shards: shard = ⌊(pos−1)·64 / N⌋, which differs in size
    * by at most one document. The global position comes from
    * [[PrefixPass.withRowNumber]] (two-phase, never an unpartitioned
    * window), and the same pass returns N for the shard arithmetic —
    * at any cluster size the plan is one range-shuffle by hash key
    * plus a numPartitions-row driver aggregate. Output: the per-shard
    * manifest (row span + byte mass) a dataloader would consume;
    * min/max positions are contiguous within a shard by construction,
    * which TrainingSetSpec asserts.
    */
  private val q222 = Q(
    "q222_epoch_shuffle",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("k",
          md5(concat(lit("epoch1|"), col("doc_id").cast(StringType))))
      val (withPos, n) = PrefixPass.withRowNumber(
        d, Seq(col("k").asc), "pos")
      withPos
        .withColumn("shard", expr(s"((pos - 1) * 64) div ${n}L"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"),
          sum(col("n_chars")).cast(LongType).as("shard_chars"))
    },
    Some("""
      WITH o AS (
        SELECT n_chars,
               ROW_NUMBER() OVER (ORDER BY
                 md5('epoch1|' || CAST(doc_id AS VARCHAR))) AS pos,
               COUNT(*) OVER () AS n
        FROM documents)
      SELECT CAST(((pos - 1) * 64) // n AS BIGINT) AS shard,
             COUNT(*) AS n_docs,
             CAST(MIN(pos) AS BIGINT) AS min_pos,
             CAST(MAX(pos) AS BIGINT) AS max_pos,
             CAST(SUM(n_chars) AS BIGINT) AS shard_chars
      FROM o GROUP BY 1
    """))

  /** N-gram-level train/eval decontamination — the GPT-3-style "remove
    * any training document sharing a long n-gram with the benchmark"
    * step, at 8-gram granularity over the q89 hash split (train =
    * buckets 0–7, eval = bucket 9; the identical md5-derived split
    * both engines compute). q96/q113 test DOCUMENT membership against
    * an external list; this finds PARTIAL overlap — a training doc
    * that merely quotes an eval doc's phrase is flagged even though
    * its own id/hash is clean.
    *
    * Shape: one corpus-scale pass to per-document DISTINCT shingles
    * (the within-doc dedup happens before the shuffle), a
    * shingle-partitioned window marks shingles any eval doc carries
    * (the q220 shape — never a self-join that would re-aggregate the
    * corpus per side), then a doc-scale distinct and two
    * dimension-table aggregates. Cost Θ(corpus tokens); no pairwise
    * doc comparison anywhere.
    */
  private val q223 = Q(
    "q223_ngram_decontamination",
    (s, dir) => {
      import graft.functions.Exprs.md5Int32
      val base = t(s, dir, "documents")
        .withColumn("b", md5Int32(col("doc_id").cast(StringType)) % 10)
      val grams = base
        .select(col("doc_id"), col("source"), col("b"),
          explode(TextOps.shingleSet(TextOps.words(col("text")), 8))
            .as("gram"))
        .select(col("doc_id"), col("source"), col("b"),
          md5(col("gram")).as("g"))
      val cont = grams
        .withColumn("has_eval",
          max(when(col("b") === 9, 1).otherwise(0))
            .over(Window.partitionBy(col("g"))))
        .filter(col("b") <= 7 && col("has_eval") === 1)
        .select(col("doc_id"), col("source")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("n_cont"))
      base.filter(col("b") <= 7)
        .groupBy(col("source")).agg(count(lit(1)).as("n_train_docs"))
        .join(cont, Seq("source"), "left")
        .select(col("source"), col("n_train_docs"),
          coalesce(col("n_cont"), lit(0L)).cast(LongType)
            .as("n_contaminated"))
        .withColumn("contaminated_frac",
          col("n_contaminated").cast(DoubleType) /
            col("n_train_docs").cast(DoubleType))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, source,
               ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10
                 AS b,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                 ' ') AS w
        FROM documents),
      grams AS (
        SELECT doc_id, source, b,
               md5(unnest(list_distinct([array_to_string(w[i+1:i+8],' ')
                            FOR i IN range(len(w)-7)]))) AS g
        FROM base WHERE len(w) >= 8),
      ev AS (SELECT DISTINCT g FROM grams WHERE b = 9),
      cont AS (
        SELECT source, COUNT(*) AS n_cont FROM (
          SELECT DISTINCT doc_id, source FROM grams
          WHERE b <= 7 AND g IN (SELECT g FROM ev))
        GROUP BY 1),
      tr AS (SELECT source, COUNT(*) AS n_train_docs
             FROM base WHERE b <= 7 GROUP BY 1)
      SELECT tr.source, n_train_docs,
             CAST(COALESCE(cont.n_cont, 0) AS BIGINT) AS n_contaminated,
             CAST(COALESCE(cont.n_cont, 0) AS DOUBLE)
               / CAST(n_train_docs AS DOUBLE) AS contaminated_frac
      FROM tr LEFT JOIN cont USING (source)
    """))

  /** Sub-document exact span dedup at 16-token tile granularity — the
    * C4/RefinedWeb line-level dedup reshaped for token streams:
    * documents are cut into NON-overlapping 16-token tiles (the last
    * tile ragged), each distinct tile text keeps exactly one owner
    * corpus-wide (first occurrence: min doc_id, then tile position),
    * and every later copy is a dropped span. Complements q220, which
    * MEASURES overlapping duplication; this one performs the removal
    * accounting a span-dedup pass would apply, at 1/16th the shingle
    * volume. Doc-level dedup (q45) cannot see these spans: two docs
    * sharing one boilerplate paragraph are distinct documents.
    *
    * Shape: tiles come from in-row array slicing (bounded explode,
    * ⌈n_tok/16⌉ per doc — linear, never quadratic), the keeper is a
    * row_number over a window partitioned by TILE HASH (per-tile
    * groups distribute at any corpus size), then one per-source
    * rollup.
    */
  private val q224 = Q(
    "q224_tile_dedup",
    (s, dir) => {
      val tiles = t(s, dir, "documents")
        // null docs have no tiles on either engine: unguarded, Spark's
        // size(NULL) = -1 made sequence(0, 0) emit one phantom
        // md5('') tile per null doc (round-12 nasty sweep)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TextOps.words(col("text")).as("w"))
        .withColumn("tile_id",
          explode(expr("sequence(0L, (size(w) - 1) div 16)")))
        .select(col("doc_id"), col("source"), col("tile_id"),
          md5(concat_ws(" ",
            slice(col("w"), (col("tile_id") * 16 + 1).cast(IntegerType),
              lit(16)))).as("h"))
      val win = Window.partitionBy(col("h"))
        .orderBy(col("doc_id").asc, col("tile_id").asc)
      tiles
        .withColumn("rk", row_number().over(win))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast(LongType).as("n_tiles"),
          sum(when(col("rk") === 1, 1L).otherwise(0L))
            .cast(LongType).as("n_kept"))
        .withColumn("kept_frac",
          col("n_kept").cast(DoubleType) / col("n_tiles").cast(DoubleType))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                 ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      tiles AS (
        SELECT doc_id, source, i AS tile_id,
               md5(array_to_string(w[i*16+1 : i*16+16], ' ')) AS h
        FROM (SELECT doc_id, source, w,
                unnest(range(((len(w)-1)//16) + 1)) AS i
              FROM toks)),
      rk AS (
        SELECT source,
               ROW_NUMBER() OVER (PARTITION BY h
                 ORDER BY doc_id ASC, tile_id ASC) AS rk
        FROM tiles)
      SELECT source, COUNT(*) AS n_tiles,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS kept_frac
      FROM rk GROUP BY 1
    """))

  /** Content-defined chunking dedup (FastCDC's idea at word
    * granularity): a chunk boundary falls after word j wherever the
    * hash of the 4-word window ending at j is ≡ 0 (mod 16) — so chunk
    * boundaries are decided by CONTENT, not position. This is the
    * property q224's fixed tiles lack: insert one word at the front of
    * a document and every 16-token tile shifts (zero tiles dedup
    * against the original), while CDC boundaries after the insertion
    * point are unchanged and every later chunk still deduplicates —
    * TrainingSetSpec proves exactly that shift-robustness. Expected
    * chunk length is the modulus (~16 words); chunks then dedup
    * corpus-wide with q224's keeper semantics (min doc_id, then chunk
    * position).
    *
    * Shape: boundary detection runs CODEGEN'd — one WordShingles
    * explode (the q220 kernel), a whole-stage md5-prefix filter that
    * keeps ~1/16 of positions, and a per-doc sort_array(collect_list)
    * reassembly of boundary positions (bounded: ~n/16 positions per
    * doc) joined back to the word arrays. Only the cheap span/chunk
    * construction is in-row higher-order functions — HOF lambdas
    * evaluate INTERPRETED in Spark, so the first cut, which ran
    * md5-per-position inside an ArrayFilter lambda, benched 8.0s at
    * sf0.1 where this shape runs with the q220 family (~0.4s): the
    * hot per-token work must stay inside whole-stage codegen, HOFs
    * are for per-CHUNK glue only. Cost Θ(corpus tokens).
    *
    * The boundary test `substr(md5(window),8,1) = '0'` is bit-equal
    * to `md5Int32(window) % 16 == 0` (the 8th hex char IS the low
    * nibble of the first-8-hex integer) — TrainingSetSpec's mirror
    * uses the integer form, so the two formulations certify each
    * other.
    */
  private val q225 = Q(
    "q225_cdc_chunk_dedup",
    (s, dir) => {
      val base = t(s, dir, "documents")
        // null docs have no chunks on either engine (q224's phantom-
        // md5('') hazard, round-12 nasty sweep)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TextOps.words(col("text")).as("w"))
      // boundary positions j (1-based, j in [4, n-1]): shingle i
      // (0-based) covers words i+1..i+4, so j = i + 4; the last
      // shingle (j = n) is excluded — a trailing boundary is a no-op
      val bps = base
        .select(col("doc_id"), col("w"),
          posexplode(TextOps.shingles(col("w"), 4)).as(Seq("i", "g4")))
        .filter(col("i") < size(col("w")) - 4 &&
          substring(md5(col("g4")), 8, 1) === "0")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("i") + 4)).as("bp"))
      val withChunks = base
        .join(bps, Seq("doc_id"), "left")
        .withColumn("bp",
          coalesce(col("bp"), array().cast("array<int>")))
        .withColumn("starts",
          concat(array(lit(1)), transform(col("bp"), x => x + 1)))
        .withColumn("ends",
          concat(col("bp"), array(size(col("w")))))
        .withColumn("chunks",
          zip_with(col("starts"), col("ends"),
            (a, b) => concat_ws(" ", slice(col("w"), a, b - a + 1))))
        .select(col("doc_id"), col("source"),
          posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("source"), col("chunk_idx"),
          md5(col("chunk")).as("h"))
      val win = Window.partitionBy(col("h"))
        .orderBy(col("doc_id").asc, col("chunk_idx").asc)
      withChunks
        .withColumn("rk", row_number().over(win))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast(LongType).as("n_chunks"),
          sum(when(col("rk") === 1, 1L).otherwise(0L))
            .cast(LongType).as("n_kept"))
        .withColumn("kept_frac",
          col("n_kept").cast(DoubleType) / col("n_chunks").cast(DoubleType))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                 ' ') AS w
        FROM documents WHERE text IS NOT NULL),
      b AS (
        SELECT doc_id, source, w,
               [j FOR j IN range(4, len(w))
                IF substr(md5(array_to_string(w[j-3:j],' ')),8,1) = '0']
                 AS bp
        FROM toks),
      c AS (
        SELECT doc_id, source, w,
               list_concat([1], [x+1 FOR x IN bp]) AS starts,
               list_concat(bp, [len(w)]) AS ends
        FROM b),
      ch AS (
        SELECT doc_id, source, k AS chunk_idx,
               md5(array_to_string(w[starts[k+1]:ends[k+1]], ' ')) AS h
        FROM (SELECT *, unnest(range(len(starts))) AS k FROM c)),
      rk AS (
        SELECT source,
               ROW_NUMBER() OVER (PARTITION BY h
                 ORDER BY doc_id ASC, chunk_idx ASC) AS rk
        FROM ch)
      SELECT source, COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS kept_frac
      FROM rk GROUP BY 1
    """))

  /** The end-to-end corpus pipeline as ONE composed query — exact
    * dedup (keep-first by normalized-text hash, q45 semantics) →
    * quality gate (q48 score ≥ 0.63, ~70% survival on the fixture) →
    * 2048-token sequence packing of the survivors (q216 semantics).
    * Each stage exists standalone elsewhere in the registry; this
    * entry pins that they COMPOSE — pack identities here are over the
    * filtered corpus, so any drift in either upstream stage shifts
    * every downstream pack id and the oracle hash catches it. The
    * quality cut compares the 6dp-ROUNDED score both engines compute
    * identically (the q48 discipline), so the gate itself is
    * bit-reproducible.
    *
    * Shape: dedup is a text-hash-partitioned window (per-cluster),
    * the gate is a map-side filter, packing is the PrefixPass
    * distributed cumsum — no global window, no driver pass; the
    * whole pipeline is three shuffles end to end (hash window, range
    * partition, pack rollup).
    */
  private val q226 = {
    val PackTokens = 2048
    Q(
      "q226_corpus_pipeline",
      (s, dir) => {
        val stop = Seq("the", "a", "of", "and", "to", "in")
        val d = t(s, dir, "documents")
          .withColumn("t", TextOps.norm(col("text")))
          .withColumn("w", split(col("t"), " "))
        val nW = size(col("w"))
        val ttr = size(array_distinct(col("w"))).cast(DoubleType) / nW
        val stopRatio =
          TextOps.vocabHits(col("w"), stop).cast(DoubleType) / nW
        val lenPrior = least(lit(1.0), nW.cast(DoubleType) / 100.0)
        val keepWin = Window.partitionBy(md5(col("t")))
          .orderBy(col("doc_id").asc)
        val survivors = d
          .withColumn("rk", row_number().over(keepWin))
          .withColumn("quality",
            round(ttr * 0.4 + (lit(1.0) - stopRatio) * 0.3
              + lenPrior * 0.3, 6))
          .filter(col("rk") === 1 && col("quality") >= 0.63)
          .select(col("doc_id"),
            regexp_count(col("t"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
              .cast(DecimalType(18, 0)).as("n_tok"))
          .filter(col("n_tok") > 0)
        val (cum, _) = PrefixPass.cumSumDecimal(survivors,
          Seq(col("doc_id").asc), "n_tok", "cum_tok")
        cum
          .withColumn("pack_id",
            expr(s"CAST(cum_tok - n_tok AS BIGINT) div $PackTokens"))
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast(LongType).as("n_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(trim(lower(text)),'\\s+',' ','g') AS t,
                 string_split(regexp_replace(trim(lower(text)),'\\s+',' ',
                   'g'),' ') AS w
          FROM documents),
        scored AS (
          SELECT doc_id, t,
                 ROW_NUMBER() OVER (PARTITION BY md5(t)
                   ORDER BY doc_id ASC) AS rk,
                 round((CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.4
                   + (1.0 - CAST(len(list_filter(w,
                       x -> x IN ('the','a','of','and','to','in')))
                       AS DOUBLE) / len(w)) * 0.3
                   + LEAST(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.3, 6)
                   AS quality
          FROM d),
        toks AS (
          SELECT doc_id,
                 len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                   AS n_tok
          FROM scored WHERE rk = 1 AND quality >= 0.63),
        cum AS (
          SELECT doc_id, n_tok,
                 SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tok
          FROM toks WHERE n_tok > 0)
        SELECT CAST((cum_tok - n_tok) // $PackTokens AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM cum GROUP BY 1
      """))
  }

  /** Deterministic negative sampling for implicit-feedback training:
    * for every customer, k=4 hash-proposed items
    * (md5Int32("cust|i") mod |parts| + 1) minus any that collide with
    * the customer's TRUE purchases — the standard
    * one-negative-per-positive trainer input, reproducible at any
    * cluster size because the proposal is pure hashing, never rand().
    * Output is the per-customer accounting (proposed / rejected /
    * accepted), which certifies the anti-join did its job:
    * n_accepted = k − collisions.
    *
    * Shape: the positive set reduces orders⋈lineitem to DISTINCT
    * (customer, part) pairs once (fact-scale shuffle, the join keys
    * of the downstream anti join), proposals are a bounded ×k explode
    * of the customer DIMENSION, and the left-anti join shuffles on
    * (cust, item) — no broadcast of anything fact-scaled, no
    * driver-side sampling loop. The |parts| modulus is a scalar
    * aggregate broadcast into the proposal expression.
    */
  private val q227 = {
    val K = 4
    Q(
      "q227_negative_sampling",
      (s, dir) => {
        import graft.functions.Exprs.md5Int32
        val pos = t(s, dir, "orders").select(col("o_orderkey"),
            col("o_custkey"))
          .join(t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("custkey"),
            col("l_partkey").as("item"))
          .distinct()
        val nParts = t(s, dir, "part")
          .agg(max(col("p_partkey")).as("max_part"))
        val proposals = t(s, dir, "customer").select(col("c_custkey"))
          .crossJoin(broadcast(nParts))
          .select(col("c_custkey").as("custkey"), col("max_part"),
            explode(sequence(lit(0), lit(K - 1))).as("i"))
          .select(col("custkey"),
            (md5Int32(concat(col("custkey").cast(StringType), lit("|"),
              col("i").cast(StringType))) % col("max_part") + 1)
              .as("item"))
        val accepted = proposals
          .join(pos, Seq("custkey", "item"), "left_anti")
          .groupBy(col("custkey"))
          .agg(count(lit(1)).as("n_accepted"))
        t(s, dir, "customer").select(col("c_custkey").as("custkey"))
          .join(accepted, Seq("custkey"), "left")
          .select(col("custkey"),
            lit(K.toLong).as("n_proposed"),
            coalesce(col("n_accepted"), lit(0L)).as("n_accepted"))
          .withColumn("n_rejected",
            col("n_proposed") - col("n_accepted"))
      },
      Some(s"""
        WITH pos AS (
          SELECT DISTINCT o_custkey AS custkey, l_partkey AS item
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        mp AS (SELECT MAX(p_partkey) AS max_part FROM part),
        prop AS (
          SELECT c_custkey AS custkey,
                 ('0x'||substr(md5(CAST(c_custkey AS VARCHAR) || '|' ||
                   CAST(i AS VARCHAR)),1,8))::BIGINT % max_part + 1 AS item
          FROM customer, mp, unnest(range($K)) AS t(i)),
        acc AS (
          SELECT custkey, COUNT(*) AS n_accepted
          FROM prop ANTI JOIN pos USING (custkey, item)
          GROUP BY 1)
        SELECT c_custkey AS custkey,
               CAST($K AS BIGINT) AS n_proposed,
               CAST(COALESCE(acc.n_accepted, 0) AS BIGINT) AS n_accepted,
               CAST($K - COALESCE(acc.n_accepted, 0) AS BIGINT)
                 AS n_rejected
        FROM customer LEFT JOIN acc ON c_custkey = acc.custkey
      """))
  }

  /** Deterministic stratified train/val/test split: 80/10/10 by
    * md5-hash order WITHIN each (lang, source) stratum, with EXACT
    * per-stratum counts — floor(0.8n)/floor(0.9n) boundaries over a
    * hash-shuffled row number, so the assignment is reproducible from
    * the data alone (no rand(), no epoch state) and every stratum's
    * class balance is preserved by construction. The reference's
    * train/test handling is a single un-stratified randomSplit
    * (spark_model_trainer.py:72 trains on everything); stratified
    * exact-proportion splitting is the step an evaluation pipeline
    * needs BEFORE the q223/q232 decontamination passes make sense.
    *
    * Scale: one partitioned window per stratum (lang x source —
    * thousands of strata in production, each shuffle-spread), then a
    * plain group-count; nothing global, nothing collected. Output is
    * per (stratum, split) counts plus the min doc_id as a membership
    * spot-check, so the oracle pins assignment, not just totals. */
  private val q230 = Q(
    "q230_stratified_split",
    (s, dir) => {
      val stratum = Window.partitionBy(col("lang"), col("source"))
      val ord = stratum.orderBy(
        md5(col("doc_id").cast(StringType).cast(BinaryType)),
        col("doc_id"))
      t(s, dir, "documents")
        .select(col("lang"), col("source"), col("doc_id"))
        .withColumn("n", count(lit(1)).over(stratum))
        .withColumn("rn", row_number().over(ord).cast(LongType))
        .withColumn("split",
          when(col("rn") <= expr("(n * 8) div 10"), "train")
            .when(col("rn") <= expr("(n * 9) div 10"), "val")
            .otherwise("test"))
        .groupBy(col("lang"), col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
    },
    Some("""
      WITH r AS (
        SELECT lang, source, doc_id,
               COUNT(*) OVER (PARTITION BY lang, source) AS n,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      SELECT lang, source,
             CASE WHEN rn <= (n * 8) // 10 THEN 'train'
                  WHEN rn <= (n * 9) // 10 THEN 'val'
                  ELSE 'test' END AS split,
             COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      FROM r GROUP BY 1, 2, 3
    """))

  /** Token-budget data selection (curriculum head): per language, keep
    * the highest-quality documents until a fixed token budget (2000)
    * is exhausted — the selection step of quality-pruned pretraining
    * mixes (score docs, sort, take the best slice the budget affords).
    * Quality here is the integer type-token ratio
    * floor(n_distinct_tokens x 10^6 / n_tokens) with doc_id
    * tie-break, so the order is total and engine-exact.
    *
    * Scale: the running sum is NEVER a per-lang partitioned window —
    * group count is tiny (5 langs) while group size scales with the
    * corpus, the exact skew shape [[PrefixPass.withRowNumberByGroup]]
    * documents. Instead ONE [[PrefixPass.cumSumDecimal]] under the
    * lang-leading total order (lang asc, score desc, doc_id) gives a
    * global running sum in which each lang's rows are contiguous, and
    * the per-lang cum is `global cum - lang offset`, with the 5-row
    * offset table computed by a broadcast triangular self-join of the
    * per-lang totals (no global window anywhere). */
  private val q231 = {
    val Budget = 2000L
    Q(
      "q231_token_budget_select",
      (s, dir) => {
        // CONTENT-GROUP grain for the regex tokenize (round-18, the
        // q251/q253 reshape): n_tok/n_types depend only on the
        // normalized text, so the BPE-ish regexp runs once per
        // DISTINCT content and fans out to (lang, doc_id) rows
        // through a slim membership join — norm is idempotent, so
        // tokenizing the group's nt is byte-identical to the old
        // per-doc regexp_extract_all(norm(text)).
        val base = t(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            TextOps.norm(col("text")).as("nt"))
          .filter(col("nt").isNotNull)
        val hstats = ShufflePlan.pinnedByKey(
          base.select(md5(col("nt")).as("h"), col("nt")), col("h"))
          .groupBy(col("h")).agg(min(col("nt")).as("nt"))
          .withColumn("w", regexp_extract_all(col("nt"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .select(col("h"), size(col("w")).cast(LongType).as("n_tok"),
            size(array_distinct(col("w"))).cast(LongType).as("n_types"))
        val scored = base
          .select(col("lang"), col("doc_id"), md5(col("nt")).as("h"))
          .join(hstats, "h")
          .filter(col("n_tok") > 0)
          .withColumn("score", expr("(n_types * 1000000) div n_tok"))
          .withColumn("tok_dec", col("n_tok").cast(DecimalType(20, 0)))
        val (withCum, _) = PrefixPass.cumSumDecimal(scored,
          Seq(col("lang").asc, col("score").desc, col("doc_id").asc),
          "tok_dec", "gcum")
        val totals = scored.groupBy(col("lang"))
          .agg(sum(col("n_tok")).as("lang_tot"))
        val off = totals.alias("a")
          .join(broadcast(totals.alias("b")),
            col("b.lang") < col("a.lang"), "left")
          .groupBy(col("a.lang").as("lang"))
          .agg(coalesce(sum(col("b.lang_tot")), lit(0L)).as("off"))
        withCum.join(broadcast(off), "lang")
          .filter(col("gcum") - col("off") <= Budget)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_tok")).cast(LongType).as("tok_kept"),
            min(col("score")).as("cutoff_score"))
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, doc_id,
                 regexp_extract_all(
                   regexp_replace(trim(lower(text)),'\\s+',' ','g'),
                   '[a-z]+|[0-9]+|[^a-z0-9 ]') AS w
          FROM documents),
        scored AS (
          SELECT lang, doc_id,
                 CAST(len(w) AS BIGINT) AS n_tok,
                 (CAST(len(list_distinct(w)) AS BIGINT) * 1000000)
                   // CAST(len(w) AS BIGINT) AS score
          FROM toks WHERE len(w) > 0),
        cum AS (
          SELECT lang, doc_id, n_tok, score,
                 SUM(n_tok) OVER (PARTITION BY lang
                   ORDER BY score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS c
          FROM scored)
        SELECT lang, COUNT(*) AS n_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tok_kept,
               MIN(score) AS cutoff_score
        FROM cum WHERE c <= $Budget GROUP BY 1
      """))
  }

  /** Exact duplicated-substring REMOVAL — the Lee et al.
    * ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499) suffix-array ExactSubstr step, re-expressed
    * as a linear shingle pass: a token position is removable iff one
    * of its covering 8-grams has an EARLIER occurrence anywhere in
    * the corpus (earlier = smaller (doc_id, pos) — so exactly one
    * canonical occurrence of every duplicated substring survives,
    * including self-repeats within a document), and the removable
    * 8-gram starts merge into MAXIMAL spans with q177's
    * gaps-and-islands kernel. Reported spans of e−s+1 consecutive
    * duplicated starts cover e−s+8 tokens; spans shorter than
    * MinSpan tokens are left in place (Lee et al.'s length
    * threshold). q220 MEASURES this duplication; q224/q225
    * approximate removal at tile/chunk granularity; this emits the
    * exact maximal token spans a remover would cut. Known gram-level
    * over-merge: adjacent starts duplicated in DIFFERENT places
    * chain into one span — the standard trade for staying linear.
    *
    * Shape: canonical ownership is ONE map-side-combinable
    * `min(struct(doc_id, pos))` aggregate per gram — deliberately
    * NOT a per-gram row_number window (a boilerplate gram occurring
    * 10⁸ times corpus-wide would pin one un-splittable window
    * partition; the agg combines map-side and the join back is
    * AQE-skew-splittable). Island merging is a per-DOC window
    * (bounded by doc length). Cost Θ(corpus tokens); output mass =
    * number of maximal spans, data-linear. */
  private val SpanK = 8        // gram width = min detectable dup run
  private val SpanMin = 10     // only spans covering >= this many cut

  /** The q233/q237 shared kernel: per-doc words + MAXIMAL duplicated
    * spans (0-based marked-start runs [s, e], already MinSpan-
    * filtered; the run covers tokens s..e+K−1). See q233 for the
    * semantics and scale argument. */
  private def dupSpanKernel(docs0: DataFrame)
      : (DataFrame, DataFrame) = {
    val d = docs0.select(col("doc_id"), col("source"),
      TextOps.words(col("text")).as("w"))
    val grams = d
      .select(col("doc_id"), col("source"),
        posexplode(TextOps.shingles(col("w"), SpanK)).as(Seq("pos", "g8")))
      .select(col("doc_id"), col("source"), col("pos"),
        md5(col("g8")).as("g"))
    val canon = grams.groupBy(col("g"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("c"))
    val marked = grams.join(canon, "g")
      .filter(col("doc_id") =!= col("c.doc_id") ||
        col("pos") =!= col("c.pos"))
      .select(col("doc_id"), col("source"), col("pos"))
    val rn = row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("pos")))
    val spans = marked
      .withColumn("grp", col("pos") - rn)
      .groupBy(col("doc_id"), col("source"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"))
      .filter(col("e") - col("s") + SpanK >= SpanMin)
    (d, spans)
  }

  /** The same span chain as DuckDB CTEs ending in `sp(doc_id, source,
    * s, e)` (unfiltered; callers apply the MinSpan cut). */
  private val dupSpanSql: String = s"""toks AS (
          SELECT doc_id, source,
                 string_split(regexp_replace(trim(lower(text)),'\\s+',' ','g'),
                   ' ') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, source, i AS pos,
                 md5(array_to_string(w[i+1:i+$SpanK],' ')) AS g
          FROM (SELECT doc_id, source, w, unnest(range(len(w)-${SpanK - 1}))
                  AS i
                FROM toks WHERE len(w) >= $SpanK)),
        rk AS (
          SELECT doc_id, source, pos,
                 ROW_NUMBER() OVER (PARTITION BY g
                   ORDER BY doc_id, pos) AS rk
          FROM grams),
        marked AS (SELECT doc_id, source, pos FROM rk WHERE rk > 1),
        isl AS (
          SELECT doc_id, source, pos,
                 pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY pos) AS grp
          FROM marked),
        sp AS (
          SELECT doc_id, source, MIN(pos) AS s, MAX(pos) AS e
          FROM isl GROUP BY doc_id, source, grp)"""

  private val q233 = Q(
    "q233_dup_span_removal",
    (s, dir) => {
      val (_, spans) = dupSpanKernel(t(s, dir, "documents"))
      spans.select(col("doc_id"), col("source"),
        (col("s") + 1).cast(LongType).as("span_start"),
        (col("e") - col("s") + SpanK).cast(LongType).as("span_tokens"))
    },
    Some(s"""
        WITH $dupSpanSql
        SELECT doc_id, source,
               CAST(s + 1 AS BIGINT) AS span_start,
               CAST(e - s + $SpanK AS BIGINT) AS span_tokens
        FROM sp WHERE e - s + $SpanK >= $SpanMin
      """))

  /** The REMOVAL itself — q233's spans materialized as a cleaned
    * corpus: every token covered by a qualifying duplicated span is
    * cut, the survivors reassemble (normalized text, space-joined) and
    * the per-doc removed/kept accounting is exact. Completes the Lee
    * et al. family as a transform: q220 measures, q233 locates, q237
    * removes. Overlapping coverage (two qualifying islands closer
    * than K tokens) is unioned via DISTINCT before the cut, so no
    * token is double-counted.
    *
    * Shape: covered positions come from a bounded explode of span
    * ranges (output-mass linear), survivors via one (doc_id, pos)
    * anti-join, reassembly via one per-doc sort agg (bounded by doc
    * length) — corpus-token-scale rows flow through exactly two
    * shuffles beyond the kernel's. Null text propagates NULL through
    * every output column on both engines. */
  private val q237 = Q(
    "q237_dup_span_cleanse",
    (s, dir) => {
      val (d, spans) = dupSpanKernel(t(s, dir, "documents"))
      val covered = spans
        .select(col("doc_id"),
          explode(sequence(col("s"), col("e") + SpanK - 1)).as("pos"))
        .distinct()
      val toks = d.select(col("doc_id"),
        posexplode(col("w")).as(Seq("pos", "word")))
      val agg = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("word")))),
            p => p.getField("word")), " ").as("cleaned0"))
      d.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          when(col("w").isNotNull, size(col("w")))
            .cast(LongType).as("n_tokens"),
          when(col("w").isNotNull,
            size(col("w")) - coalesce(col("n_kept"), lit(0L)))
            .cast(LongType).as("n_removed"),
          when(col("w").isNotNull, coalesce(col("cleaned0"), lit("")))
            .as("cleaned"))
    },
    Some(s"""
        WITH $dupSpanSql,
        cov AS (
          SELECT DISTINCT doc_id, unnest(range(s, e + $SpanK)) AS pos
          FROM sp WHERE e - s + $SpanK >= $SpanMin),
        tk AS (
          SELECT doc_id, i AS pos, w[i+1] AS word
          FROM (SELECT doc_id, w, unnest(range(len(w))) AS i FROM toks)),
        kept AS (
          SELECT tk.doc_id, tk.pos, tk.word FROM tk
          LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.pos = tk.pos
          WHERE cov.doc_id IS NULL),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 array_to_string(list(word ORDER BY pos), ' ') AS cleaned0
          FROM kept GROUP BY 1)
        SELECT t.doc_id, t.source,
               CASE WHEN t.w IS NULL THEN NULL
                    ELSE CAST(len(t.w) AS BIGINT) END AS n_tokens,
               CASE WHEN t.w IS NULL THEN NULL
                    ELSE CAST(len(t.w) - COALESCE(n_kept, 0) AS BIGINT)
               END AS n_removed,
               CASE WHEN t.w IS NULL THEN NULL
                    ELSE COALESCE(cleaned0, '') END AS cleaned
        FROM toks t LEFT JOIN agg USING (doc_id)
      """))

  /** Deterministic stratified RESERVOIR sample — the eval/calibration
    * draw a 100 TB pipeline needs: exactly K docs per language,
    * uniform without replacement, identical on every run and every
    * engine. Sampling is by HASH RANK — the K smallest 60-bit md5
    * prefixes of "sample1|doc_id" per stratum (a new salt = a fresh
    * independent sample, the q222 epoch trick) — so "uniform random"
    * becomes a deterministic total order both engines share; rand()
    * is irreproducible and a per-stratum sort is a fact-scale
    * shuffle. The selection runs as the mergeable TopK Aggregator:
    * at most K rows per partition per stratum reach the shuffle
    * (bounded state — a billion-doc stratum never buffers), the
    * bounded-heap equivalent of reservoir sampling with none of its
    * sequential-scan order dependence. Oracle = the ROW_NUMBER
    * formulation over the same hash, proving the heap and the sort
    * agree exactly. */
  private val q236 = {
    val K = 20
    Q(
      "q236_stratified_sample",
      (s, dir) => {
        import s.implicits._
        val ds = t(s, dir, "documents")
          .select(col("lang"),
            expr("cast(conv(substring(md5(concat('sample1|', " +
              "cast(doc_id as string))),1,15),16,10) as bigint)").as("h"),
            col("doc_id"))
          .as[(String, Long, Long)]
        ds.groupByKey(_._1)
          // TopK ranks (v desc, t asc): v = -h gives smallest-hash
          // first, doc_id ascending as the (astronomically unlikely)
          // tie-break — mirroring ORDER BY h, doc_id
          .mapValues(r => (-r._2, r._3))
          .agg(new graft.functions.TopK(K).toColumn.name("top"))
          .toDF("lang", "top")
          .select(col("lang"), posexplode(col("top")).as(Seq("pos", "pair")))
          .select(col("lang"), (col("pos") + 1).cast(LongType).as("rnk"),
            col("pair._2").as("doc_id"))
      },
      Some(s"""
        WITH h AS (
          SELECT lang, doc_id,
                 CAST(('0x'||substr(md5('sample1|'||CAST(doc_id AS VARCHAR)),
                   1,15)) AS BIGINT) AS h
          FROM documents),
        r AS (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY h, doc_id) AS rnk
          FROM h)
        SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id
        FROM r WHERE rnk <= $K
      """))
  }

  /** Split-leakage audit: pairwise 8-gram overlap between the
    * train/val/test parts of the q89 hash split — the "did the split
    * leak" check a pipeline runs AFTER splitting, complementing q223
    * (train vs a held-out eval corpus) with the intra-split view.
    * For each ordered part pair, the number of distinct 8-grams
    * present in BOTH, and that mass as an exact micro-fraction of the
    * second part's vocabulary (the fraction of b's n-grams already
    * seen in a — the memorization-risk direction when a=train).
    *
    * Shape: ONE corpus-scale gram aggregation to per-gram presence
    * flags (max of split indicators — map-side combinable,
    * md5-compressed keys), then the pair algebra runs on ONE row of
    * global counts; no self-join, no per-pair corpus pass. */
  private val q239 = Q(
    "q239_split_leakage",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("b",
          graft.functions.Exprs.md5Int32(col("doc_id").cast(StringType)) % 10)
        .withColumn("split",
          when(col("b") <= 7, "train").when(col("b") === 8, "val")
            .otherwise("test"))
      val flags = d
        .select(col("split"), explode(
          TextOps.shingleSet(TextOps.words(col("text")), 8)).as("g8"))
        .select(col("split"), md5(col("g8")).as("g"))
        .groupBy(col("g"))
        .agg(
          max(when(col("split") === "train", 1L).otherwise(0L)).as("tr"),
          max(when(col("split") === "val", 1L).otherwise(0L)).as("va"),
          max(when(col("split") === "test", 1L).otherwise(0L)).as("te"))
      val tot = flags.agg(
        sum(col("tr")).as("n_tr"), sum(col("va")).as("n_va"),
        sum(col("te")).as("n_te"),
        sum(col("tr") * col("va")).as("tr_va"),
        sum(col("tr") * col("te")).as("tr_te"),
        sum(col("va") * col("te")).as("va_te"))
      val pairs = Seq(
        ("train", "val", "tr_va", "n_va"),
        ("train", "test", "tr_te", "n_te"),
        ("val", "test", "va_te", "n_te"))
      // Zero guard: a degenerate corpus where a split holds no
      // >=8-token docs makes nc = 0 — both engines must agree on NULL
      // there (DuckDB's bare `// 0` would raise instead; its oracle
      // uses NULLIF).
      pairs.map { case (a, b, sc, nc) =>
        tot.select(lit(a).as("part_a"), lit(b).as("part_b"),
          col(sc).cast(LongType).as("shared_grams"),
          col(nc).cast(LongType).as("n_grams_b"),
          when(col(nc) > 0, expr(s"($sc * 1000000) div $nc"))
            .cast(LongType).as("leak_frac_micro"))
      }.reduce(_ unionByName _)
    },
    Some("""
      WITH d AS (
        SELECT doc_id, text,
               CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))
                      ::BIGINT % 10 <= 7 THEN 'train'
                    WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))
                      ::BIGINT % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
      toks AS (
        SELECT split,
               string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                 ' ') AS w
        FROM d),
      grams AS (
        SELECT split,
               md5(unnest(list_distinct([array_to_string(w[i+1:i+8],' ')
                            FOR i IN range(len(w)-7)]))) AS g
        FROM toks WHERE len(w) >= 8),
      flags AS (
        SELECT g,
               MAX(CASE WHEN split='train' THEN 1 ELSE 0 END) AS tr,
               MAX(CASE WHEN split='val' THEN 1 ELSE 0 END) AS va,
               MAX(CASE WHEN split='test' THEN 1 ELSE 0 END) AS te
        FROM grams GROUP BY 1),
      tot AS (
        SELECT SUM(tr) AS n_tr, SUM(va) AS n_va, SUM(te) AS n_te,
               SUM(tr*va) AS tr_va, SUM(tr*te) AS tr_te,
               SUM(va*te) AS va_te
        FROM flags)
      SELECT 'train' AS part_a, 'val' AS part_b,
             CAST(tr_va AS BIGINT) AS shared_grams,
             CAST(n_va AS BIGINT) AS n_grams_b,
             CAST(tr_va * 1000000 // NULLIF(n_va, 0) AS BIGINT)
               AS leak_frac_micro
      FROM tot
      UNION ALL
      SELECT 'train', 'test', CAST(tr_te AS BIGINT),
             CAST(n_te AS BIGINT),
             CAST(tr_te * 1000000 // NULLIF(n_te, 0) AS BIGINT) FROM tot
      UNION ALL
      SELECT 'val', 'test', CAST(va_te AS BIGINT),
             CAST(n_te AS BIGINT),
             CAST(va_te * 1000000 // NULLIF(n_te, 0) AS BIGINT) FROM tot
    """))

  /** Duplicate-aware loss weighting: every document in a q46
    * vocabulary-fingerprint cluster of size m carries weight 1/m, so
    * each duplicated content unit contributes exactly one document's
    * worth of training signal (the "count each cluster once"
    * reweighting that is the soft alternative to dropping
    * duplicates). Per source: exact integer micro-weight mass,
    * effective (dedup-weighted) doc count vs raw count. Weight sums
    * are exact because every doc in a cluster gets the SAME
    * floor(1e6/m) micro-weight — no remainder ambiguity across
    * engines.
    *
    * Shape: one fingerprint aggregation (map-side combinable), one
    * equi-join back, one per-source rollup — all corpus-linear. */
  private val q240 = Q(
    "q240_dedup_loss_weights",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.fingerprint(col("text")).as("fp"))
      val sizes = d.groupBy(col("fp")).agg(count(lit(1)).as("m"))
      d.join(sizes, "fp")
        .withColumn("w_micro", expr("1000000 div m"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(col("w_micro")).cast(LongType).as("weight_mass_micro"),
          sum(when(col("m") === 1, 1L).otherwise(0L))
            .cast(LongType).as("n_unique"))
    },
    Some("""
      WITH fp AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct(
                 string_split(regexp_replace(trim(lower(text)),'\s+',' ','g'),
                   ' '))), ' ')) AS fp
        FROM documents),
      sz AS (SELECT fp, COUNT(*) AS m FROM fp GROUP BY 1)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(1000000 // m) AS BIGINT) AS weight_mass_micro,
             CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
      FROM fp JOIN sz USING (fp)
      GROUP BY 1
    """))

  /** Mixing-temperature sweep: q218's apportionment at τ ∈ {0.25,
    * 0.5, 0.75, 1.0} in one query — the table a DoReMi-style mixture
    * decision actually reads (how much does each τ flatten the head
    * sources and boost the tail) before committing to the single τ
    * q218 ships. Per (τ, source): the integer weight, the exact
    * largest-remainder allocation of the same 1M-sample budget, and
    * the normalized share.
    *
    * Engine exactness without libm pow: pow is NOT correctly rounded
    * (Java vs C can differ an ulp, and floor() amplifies that to an
    * off-by-one weight), but sqrt IS — so every n^τ here is a sqrt
    * composition: n^.25 = sqrt(sqrt(n·10²⁴)), n^.5 = sqrt(n·10¹²),
    * n^.75 = sqrt(n·10⁴)·sqrt(sqrt(n·10⁸)), n¹ = n — each τ with its own
    * fixed scale, chosen so B·w stays under 2⁶³ at 10¹¹ documents
    * (normalization is per τ, so the scales cancel).
    *
    * Scale shape: ONE group-count of the corpus; the sweep is 4×
    * |sources| rows of integer algebra with windows PARTITIONED BY τ
    * over the dimension-bounded source list (the q218 whitelisted
    * window shape, one extra 4-value key). */
  private val q264 = {
    val Budget = 1000000L
    Q(
      "q264_temperature_sweep",
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val nD = col("n_docs").cast(DoubleType)
        val sweep = counts
          .withColumn("tau_u", explode(typedlit(Seq(25L, 50L, 75L, 100L))))
          .withColumn("w",
            when(col("tau_u") === 25, floor(sqrt(sqrt(nD * lit(1e24)))))
              .when(col("tau_u") === 50, floor(sqrt(nD * lit(1e12))))
              .when(col("tau_u") === 75,
                floor(sqrt(nD * lit(1e4)) * sqrt(sqrt(nD * lit(1e8)))))
              .otherwise(col("n_docs"))
              .cast(LongType))
        val all = Window.partitionBy(col("tau_u"))
        val rk = Window.partitionBy(col("tau_u"))
          .orderBy(col("rem").desc, col("source").asc)
        sweep
          .withColumn("tot_w", sum(col("w")).over(all))
          .withColumn("floor_alloc", expr(s"($Budget * w) div tot_w"))
          .withColumn("rem", expr(s"($Budget * w) % tot_w"))
          .withColumn("deficit",
            lit(Budget) - sum(col("floor_alloc")).over(all))
          .withColumn("rk", row_number().over(rk).cast(LongType))
          .select(col("tau_u"), col("source"), col("n_docs"),
            (col("floor_alloc") +
              when(col("rk") <= col("deficit"), 1L).otherwise(0L))
              .as("alloc"),
            round(col("w").cast(DoubleType) /
              col("tot_w").cast(DoubleType), 6).as("weight"))
          .orderBy(col("tau_u"), col("source"))
      },
      Some(s"""
        WITH c AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        sweep AS (
          SELECT tau_u, source, n_docs,
                 CAST(CASE tau_u
                   WHEN 25 THEN FLOOR(SQRT(SQRT(
                     CAST(n_docs AS DOUBLE) * 1e24)))
                   WHEN 50 THEN FLOOR(SQRT(CAST(n_docs AS DOUBLE) * 1e12))
                   WHEN 75 THEN FLOOR(SQRT(CAST(n_docs AS DOUBLE) * 1e4)
                     * SQRT(SQRT(CAST(n_docs AS DOUBLE) * 1e8)))
                   ELSE n_docs
                 END AS BIGINT) AS w
          FROM c, (SELECT CAST(unnest([25, 50, 75, 100]) AS BIGINT)
                     AS tau_u) t),
        g AS (
          SELECT tau_u, source, n_docs, w,
                 SUM(w) OVER (PARTITION BY tau_u) AS tot_w,
                 ($Budget * w) // SUM(w) OVER (PARTITION BY tau_u)
                   AS floor_alloc,
                 ($Budget * w) % SUM(w) OVER (PARTITION BY tau_u) AS rem
          FROM sweep),
        r AS (
          SELECT *,
                 $Budget - SUM(floor_alloc) OVER (PARTITION BY tau_u)
                   AS deficit,
                 ROW_NUMBER() OVER (PARTITION BY tau_u
                   ORDER BY rem DESC, source ASC) AS rk
          FROM g)
        SELECT tau_u, source, n_docs,
               CAST(floor_alloc + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc,
               round(CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS weight
        FROM r
        ORDER BY tau_u, source
      """))
  }

  val registry: Seq[Q] =
    Seq(q218, q219, q220, q221, q222, q223, q224, q225, q226, q227,
      q230, q231, q233, q236, q237, q239, q240, q264)
}
