package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** Round-15 wave: the unigram-LM (SentencePiece-style) tokenizer next
  * to q242's BPE — the OTHER tokenizer family a production stack
  * trains (Kudo 2018: start from a big seed vocabulary, alternate
  * E [Viterbi-segment the corpus under current piece probabilities]
  * and M [re-estimate probabilities from the segmentation], pruning
  * low-value pieces between rounds).
  *
  * Shape of the implementation (all grains vocabulary-scale — the
  * q242 discipline: the corpus is scanned once for the word-frequency
  * table; everything after works on distinct words):
  *
  *  - Seed: every single code point (kept forever — guarantees any
  *    word stays segmentable) plus the top-[[SeedMulti]] substrings
  *    of length 2..[[MaxPiece]] by corpus frequency.
  *  - Probabilities as integer COSTS: cost_u(piece) =
  *    round(-ln(cnt/total), 6) in exact micro-units via
  *    DECIMAL(18,6) (the q264 lesson: never cast raw doubles to
  *    BIGINT — Spark truncates where DuckDB rounds). ln() itself is
  *    engine-parity-safe after 6-dp rounding (the q252 discipline).
  *    Viterbi then MINIMIZES an integer sum — every comparison exact
  *    on both engines, no float drift anywhere in the DP.
  *  - Viterbi: a forward DP over word positions 0..[[MaxWord]],
  *    state = (best cost_u, its segmentation string), candidates per
  *    position from the ≤[[MaxPiece]] predecessors; ties break on
  *    the lexicographically smallest segmentation (strings compare
  *    in UTF-8 byte order on both engines). Unrolled position by
  *    position — [[MaxWord]] vocabulary-scale joins per pass, each a
  *    partitioned window, mirrored in the oracle as MATERIALIZED
  *    CTEs exactly like q242's unrolled merge rounds. Words longer
  *    than [[MaxWord]] code points fall back to per-code-point
  *    segmentation (deterministic, and they keep feeding the char
  *    counts), so the DP depth is a hard constant, not data-driven.
  *  - EM: two full E+M rounds (seed → DP → counts → prune to
  *    chars + top-[[KeepMulti]] multis → re-estimate with add-one
  *    smoothing → DP → counts → final model), then apply segments
  *    under the FINAL model — three DP passes total, each bounded.
  *  - Train-once/apply-many: the final model and the per-word
  *    segmentation persist as a parquet artifact next to q242's
  *    (same corpus fingerprint + in-JVM memo pattern), so one
  *    verify/bench pass trains once and q272/q273 share it.
  *
  * At 100 TB: one corpus scan (map-side-combined word counts), then
  * ~50 joins/windows over the distinct-word table (1e7–1e8 rows for
  * web text — each pass seconds on a cluster), and one final
  * explode+join token-accounting pass (q243's shape, AQE-skew-safe).
  */
object UnigramQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** Longest piece learned/considered (code points). */
  private[graft] val MaxPiece = 4
  /** Viterbi DP depth: words longer than this fall back to
    * per-code-point segmentation. */
  private[graft] val MaxWord = 16
  /** Seed vocabulary: top-K multi-char substrings by frequency. */
  private[graft] val SeedMulti = 48
  /** Pieces surviving each prune: all chars + top-K multis. */
  private[graft] val KeepMulti = 32

  // -------------------------------------------------------------------
  // Spark side
  // -------------------------------------------------------------------

  /** Distinct words with corpus frequency, code-point array, length.
    * (?s). matches exactly one code point on both engines — the q242
    * convention. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("cs",
        regexp_extract_all(col("word"), lit("(?s)."), lit(0)))
      .withColumn("len", size(col("cs")))

  /** cost_u = round(-ln(cnt/tot), 6) in exact integer micro-units.
    * The DECIMAL hop keeps the double→BIGINT conversion identical on
    * both engines. */
  private def costU(cnt: Column, tot: Column): Column =
    (round(-log(cnt.cast(DoubleType) / tot.cast(DoubleType)), 6)
      .cast(DecimalType(18, 6)) * lit(1000000)).cast(LongType)

  /** All (word, i, j, piece) spans of DP-eligible words: piece =
    * code points [i+1 .. j], 1 ≤ j−i ≤ MaxPiece. Vocabulary-scale ×
    * ≤ MaxWord·MaxPiece rows. */
  private def spanTable(wt: DataFrame): DataFrame =
    wt.filter(col("len") <= MaxWord)
      .select(col("word"), col("cs"), col("len"),
        explode(sequence(lit(0), col("len") - 1)).as("i"))
      .select(col("word"), col("cs"), col("len"), col("i"),
        explode(sequence(lit(1), lit(MaxPiece))).as("l"))
      .filter(col("i") + col("l") <= col("len"))
      .select(col("word"), col("i"), (col("i") + col("l")).as("j"),
        array_join(slice(col("cs"), col("i") + 1, col("l")), "")
          .as("piece"))

  /** One Viterbi pass: per DP-eligible word, the minimum-cost
    * segmentation under `model` (piece, cost_u), ties to the
    * lexicographically smallest segmentation string. Returns
    * (word, seg). */
  private def viterbi(wt: DataFrame, spans: DataFrame,
      model: DataFrame): DataFrame = {
    val e = spans
      .join(model.select(col("piece"), col("cost_u")), "piece")
      .select(col("word"), col("i"), col("j"), col("cost_u"),
        col("piece"))
      .localCheckpoint()
    val dpw = wt.filter(col("len") <= MaxWord)
      .select(col("word"), col("len")).localCheckpoint()
    val dps = scala.collection.mutable.Map(0 ->
      dpw.select(col("word"), lit(0L).as("c"), lit("").as("seg")))
    val w = Window.partitionBy(col("word"))
      .orderBy(col("c"), col("seg"))
    for (j <- 1 to MaxWord) {
      val cands = (math.max(0, j - MaxPiece) until j).map { i =>
        dps(i).join(
          e.filter(col("i") === i && col("j") === j)
            .select(col("word"), col("cost_u"), col("piece")),
          "word")
          .select(col("word"), (col("c") + col("cost_u")).as("c"),
            when(col("seg") === "", col("piece"))
              .otherwise(concat(col("seg"), lit(" "), col("piece")))
              .as("seg"))
      }.reduce(_ unionByName _)
      dps(j) = cands.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint()
    }
    (1 to MaxWord).map { j =>
      dps(j).join(dpw.filter(col("len") === j).select(col("word")),
        "word")
        .select(col("word"), col("seg"))
    }.reduce(_ unionByName _)
  }

  /** E-step counts under a segmentation: DP words contribute their
    * Viterbi pieces, fallback words (len > MaxWord) their code
    * points, all weighted by corpus word frequency. */
  private def pieceCounts(wt: DataFrame, segs: DataFrame): DataFrame = {
    val dpCnt = segs.join(wt.select(col("word"), col("wc")), "word")
      .select(col("wc"), explode(split(col("seg"), " ")).as("piece"))
    val fbCnt = wt.filter(col("len") > MaxWord)
      .select(col("wc"), explode(col("cs")).as("piece"))
    dpCnt.unionByName(fbCnt)
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
  }

  /** M-step: prune to chars + top-KeepMulti multis, re-estimate with
    * add-one smoothing. Returns (piece, cnt, is_char, cost_u). */
  private def reestimate(model: DataFrame, cnts: DataFrame): DataFrame = {
    val chars = model.filter(col("is_char")).select(col("piece"))
      .join(cnts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        lit(true).as("is_char"))
    val multis = cnts
      .join(model.filter(!col("is_char")).select(col("piece")), "piece")
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(KeepMulti)
      .select(col("piece"), col("cnt"), lit(false).as("is_char"))
    val kept = chars.unionByName(multis).localCheckpoint()
    val tot = kept.agg(sum(col("cnt") + 1).as("tot"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"), col("is_char"),
        costU(col("cnt") + 1, col("tot")).as("cost_u"))
  }

  /** The full training loop. Returns (final model frame
    * (piece, cnt, is_char, cost_u), per-word segmentation frame
    * (word, n_tok, seg) under the final model — fallback words carry
    * seg = NULL and n_tok = their code-point count). */
  private[graft] def unigramTrain(docs: DataFrame)
      : (DataFrame, DataFrame) = {
    val wt = wordTable(docs).localCheckpoint()
    // seed: all chars + top-SeedMulti substrings, by frequency
    val charCnt = wt
      .select(col("wc"), explode(col("cs")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
      .select(col("piece"), col("cnt"), lit(true).as("is_char"))
    val multiCnt = wt
      .select(col("word"), col("cs"), col("len"), col("wc"),
        explode(sequence(lit(0), col("len") - 1)).as("i"))
      .select(col("cs"), col("len"), col("wc"), col("i"),
        explode(sequence(lit(2), lit(MaxPiece))).as("l"))
      .filter(col("i") + col("l") <= col("len"))
      .select(array_join(slice(col("cs"), col("i") + 1, col("l")), "")
        .as("piece"), col("wc"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(SeedMulti)
      .select(col("piece"), col("cnt"), lit(false).as("is_char"))
    val seed = charCnt.unionByName(multiCnt).localCheckpoint()
    val tot0 = seed.agg(sum(col("cnt")).as("tot"))
    val m0 = seed.crossJoin(broadcast(tot0))
      .select(col("piece"), col("cnt"), col("is_char"),
        costU(col("cnt"), col("tot")).as("cost_u"))
      .localCheckpoint()
    val spans = spanTable(wt).localCheckpoint()
    // EM round 1: segment under the seed, prune + re-estimate
    val m1 = reestimate(m0, pieceCounts(wt, viterbi(wt, spans, m0)))
      .localCheckpoint()
    // EM round 2: segment under m1, prune + re-estimate -> final
    val m2 = reestimate(m1, pieceCounts(wt, viterbi(wt, spans, m1)))
      .localCheckpoint()
    // apply pass: final segmentation under the final model
    val segs = viterbi(wt, spans, m2)
    val perWord = wt.select(col("word"), col("len"))
      .join(segs, Seq("word"), "left")
      .select(col("word"),
        when(col("seg").isNotNull,
          size(split(col("seg"), " ")).cast(LongType))
          .otherwise(col("len").cast(LongType)).as("n_tok"),
        col("seg"))
    (m2, perWord)
  }

  // -------------------------------------------------------------------
  // Train-once / apply-many: artifact + memo, q242's pattern (see
  // BpeQueries.trainedTokenizer for the full rationale).
  // -------------------------------------------------------------------

  private val memo = scala.collection.concurrent.TrieMap
    .empty[String, (() => DataFrame, () => DataFrame)]

  private[graft] def resetMemoForTest(): Unit = memo.clear()

  private[graft] val trainCount =
    new java.util.concurrent.atomic.AtomicLong

  private[graft] def artifactPath(s: SparkSession, dir: String): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    s"$wh/graft_unigram/" +
      s"p${MaxPiece}w${MaxWord}s${SeedMulti}k${KeepMulti}_" +
      BpeQueries.fingerprint(s, dir)
  }

  /** The session's trained unigram tokenizer for `dir`'s documents
    * corpus: (model thunk, perWord thunk) — parquet-artifact-backed
    * when the warehouse is writable (write-to-tmp + rename; a
    * half-written artifact is never loaded), in-memory otherwise. */
  private[graft] def trainedUnigram(s: SparkSession, dir: String)
      : (() => DataFrame, () => DataFrame) = {
    val base = artifactPath(s, dir)
    memo.getOrElseUpdate(s"${s.sparkContext.applicationId}|$base", {
      val basePath = new org.apache.hadoop.fs.Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val ok = new org.apache.hadoop.fs.Path(basePath, "_GRAFT_OK")
      if (fs.exists(ok))
        (() => s.read.parquet(s"$base/model"),
          () => s.read.parquet(s"$base/wordsegs"))
      else {
        trainCount.incrementAndGet()
        val (model, perWord) =
          unigramTrain(Tables.load(Tables.tuned(s), dir, "documents"))
        val modelC = model.localCheckpoint()
        val perWordC = perWord.localCheckpoint()
        val published = try {
          val tmp = new org.apache.hadoop.fs.Path(
            s"$base.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
          modelC.write.parquet(s"$tmp/model")
          perWordC.write.parquet(s"$tmp/wordsegs")
          fs.create(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_OK"), true)
            .close()
          if (fs.exists(basePath) || !fs.rename(tmp, basePath))
            fs.delete(tmp, true)
          fs.exists(ok)
        } catch { case scala.util.control.NonFatal(_) => false }
        if (published)
          (() => s.read.parquet(s"$base/model"),
            () => s.read.parquet(s"$base/wordsegs"))
        else (() => modelC, () => perWordC)
      }
    })
  }

  // -------------------------------------------------------------------
  // Oracle generator (unrolled MATERIALIZED CTEs, the q242 pattern)
  // -------------------------------------------------------------------

  private val wordsSql =
    """words AS (
      SELECT w AS word, COUNT(*) AS wc
      FROM (SELECT unnest(string_split(
              regexp_replace(trim(lower(text)),'\s+',' ','g'), ' ')) AS w
            FROM documents)
      WHERE length(w) >= 1 GROUP BY 1)"""

  private def costUSql(cnt: String, tot: String): String =
    s"CAST(CAST(round(-ln(CAST($cnt AS DOUBLE) / $tot), 6) " +
      s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"

  /** Shared seed + span CTEs (wch, seed pieces, m0, spans). */
  private def seedSql: String =
    s"""wch AS MATERIALIZED (
      SELECT word, wc, regexp_extract_all(word, '(?s).') AS cs,
             len(regexp_extract_all(word, '(?s).')) AS len
      FROM words),
    cseed AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt
      FROM (SELECT wc, unnest(cs) AS piece FROM wch) GROUP BY 1),
    mseed AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt
      FROM (SELECT array_to_string(cs[i+1:i+l], '') AS piece, wc
            FROM (SELECT wc, cs, len, unnest(range(len)) AS i FROM wch),
                 (SELECT unnest(range(2, ${MaxPiece + 1})) AS l)
            WHERE i + l <= len)
      GROUP BY 1 ORDER BY cnt DESC, piece LIMIT $SeedMulti),
    seed AS MATERIALIZED (
      SELECT piece, cnt, TRUE AS is_char FROM cseed
      UNION ALL SELECT piece, cnt, FALSE FROM mseed),
    m0 AS MATERIALIZED (
      SELECT piece, cnt, is_char,
             ${costUSql("cnt",
                "(SELECT CAST(SUM(cnt) AS DOUBLE) FROM seed)")} AS cost_u
      FROM seed),
    spans AS MATERIALIZED (
      SELECT word, i, i + l AS j,
             array_to_string(cs[i+1:i+l], '') AS piece
      FROM (SELECT word, cs, len, unnest(range(len)) AS i FROM wch
            WHERE len <= $MaxWord),
           (SELECT unnest(range(1, ${MaxPiece + 1})) AS l)
      WHERE i + l <= len)"""

  /** One full Viterbi pass (edges + unrolled DP + per-word selection)
    * under model CTE `m`, emitting CTEs `e$tag`, `dp${tag}0..`,
    * `seg$tag` (word, wc, seg). */
  private def viterbiSql(tag: String, m: String): String = {
    val e =
      s"""e$tag AS MATERIALIZED (
        SELECT s.word, s.i, s.j, mm.cost_u, s.piece
        FROM spans s JOIN $m mm USING (piece))"""
    val dp0 =
      s"""dp${tag}0 AS MATERIALIZED (
        SELECT word, CAST(0 AS BIGINT) AS c, '' AS seg
        FROM wch WHERE len <= $MaxWord)"""
    val steps = (1 to MaxWord).map { j =>
      val cands = (math.max(0, j - MaxPiece) until j).map { i =>
        s"""SELECT d.word, d.c + e.cost_u AS c,
               CASE WHEN d.seg = '' THEN e.piece
                    ELSE d.seg || ' ' || e.piece END AS seg
           FROM dp$tag$i d JOIN e$tag e
             ON d.word = e.word AND e.i = $i AND e.j = $j"""
      }.mkString("\n        UNION ALL\n        ")
      s"""dp$tag$j AS MATERIALIZED (
        SELECT word, c, seg FROM (
          SELECT word, c, seg, row_number() OVER
            (PARTITION BY word ORDER BY c, seg) AS rn
          FROM ($cands))
        WHERE rn = 1)"""
    }
    val sel = (1 to MaxWord).map(j =>
      s"""SELECT w.word, w.wc, d.seg
         FROM dp$tag$j d JOIN wch w ON d.word = w.word AND w.len = $j""")
      .mkString("\n        UNION ALL\n        ")
    val seg =
      s"""seg$tag AS MATERIALIZED (
        $sel)"""
    (Seq(e, dp0) ++ steps :+ seg).mkString(",\n    ")
  }

  /** E-step counts + M-step prune/re-estimate under the `tag` pass:
    * CTEs `cnt$tag`, `keep$tag`, and model `$out`. */
  private def emSql(tag: String, prev: String, out: String): String =
    s"""cnt$tag AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
        SELECT wc, unnest(string_split(seg, ' ')) AS piece FROM seg$tag
        UNION ALL
        SELECT wc, unnest(cs) AS piece FROM wch WHERE len > $MaxWord)
      GROUP BY 1),
    keep$tag AS MATERIALIZED (
      SELECT m.piece, COALESCE(c.cnt, 0) AS cnt, TRUE AS is_char
      FROM $prev m LEFT JOIN cnt$tag c USING (piece) WHERE m.is_char
      UNION ALL
      SELECT piece, cnt, FALSE AS is_char FROM (
        SELECT c.piece, c.cnt FROM cnt$tag c JOIN $prev m USING (piece)
        WHERE NOT m.is_char ORDER BY c.cnt DESC, c.piece
        LIMIT $KeepMulti)),
    $out AS MATERIALIZED (
      SELECT piece, cnt, is_char,
             ${costUSql("cnt + 1",
                s"(SELECT CAST(SUM(cnt + 1) AS DOUBLE) FROM keep$tag)")}
               AS cost_u
      FROM keep$tag)"""

  /** The full shared training chain: seed → EM round A → EM round B
    * (final model CTE `m2`). */
  private def trainSql: String = Seq(
    seedSql,
    viterbiSql("A", "m0"), emSql("A", "m0", "m1"),
    viterbiSql("B", "m1"), emSql("B", "m1", "m2")
  ).mkString(",\n    ")

  // -------------------------------------------------------------------
  // Queries
  // -------------------------------------------------------------------

  /** Unigram-LM tokenizer TRAINING: the final pruned piece inventory
    * with raw last-E-step counts and smoothed integer-micro-unit
    * costs — the two things a consumer needs to Viterbi-segment new
    * text. The BPE twin is q242. */
  private val q272 = Q(
    "q272_unigram_train",
    (s, dir) => trainedUnigram(s, dir)._1().select(
      col("piece"), col("is_char"), col("cnt").cast(LongType).as("cnt"),
      col("cost_u").cast(LongType).as("cost_u")),
    Some(s"""
      WITH $wordsSql,
      $trainSql
      SELECT piece, is_char, CAST(cnt AS BIGINT) AS cnt,
             CAST(cost_u AS BIGINT) AS cost_u
      FROM m2
    """))

  /** Unigram tokenizer APPLY: per-document token counts under the
    * q272 model (the q243 accounting shape — corpus pass is ONE
    * explode + word join + per-doc sum; NULL/empty-text docs kept
    * with NULL counts). Fertility vs BPE is pinned in UnigramSpec. */
  private val q273 = Q(
    "q273_unigram_token_counts",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val perWord = trainedUnigram(s, dir)._2()
        .select(col("word"), col("n_tok"))
      val agg = docs
        .select(col("doc_id"),
          explode(TextOps.words(col("text"))).as("word"))
        .filter(length(col("word")) >= 1)
        .join(perWord, "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_tok")).cast(LongType).as("n_unigram_tokens"))
      docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
    },
    Some(s"""
      WITH $wordsSql,
      $trainSql,
      ${viterbiSql("C", "m2")},
      perword AS MATERIALIZED (
        SELECT w.word,
               CASE WHEN s.seg IS NOT NULL
                    THEN CAST(len(string_split(s.seg, ' ')) AS BIGINT)
                    ELSE CAST(w.len AS BIGINT) END AS n_tok
        FROM wch w LEFT JOIN (SELECT word, seg FROM segC) s
          ON w.word = s.word),
      tok AS (
        SELECT doc_id, unnest(string_split(
                 regexp_replace(trim(lower(text)),'\\s+',' ','g'), ' ')) AS w
        FROM documents),
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_tok) AS BIGINT) AS n_unigram_tokens
        FROM tok JOIN perword ON w = word
        WHERE length(w) >= 1
        GROUP BY 1)
      SELECT d.doc_id, a.n_words, a.n_unigram_tokens
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """))

  val registry: Seq[Q] = Seq(q272, q273)
}
