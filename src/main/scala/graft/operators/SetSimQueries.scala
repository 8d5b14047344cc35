package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** q282 — EXACT set-similarity self-join via PREFIX FILTERING (the
  * AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al.
  * WWW'08) over the dedup family's 5-gram shingle sets at the q51
  * threshold (Jaccard ≥ 0.5). MinHash banding (q51) is probabilistic
  * — a true pair whose 4 bands all miss is silently dropped; prefix
  * filtering has NO false negatives: under ONE global token order,
  * any pair with jac ≥ t must share a token within each side's first
  * |x| − ⌈t·|x|⌉ + 1 tokens, so the prefix-prefix equi-join is a
  * COMPLETE candidate set and the exact Jaccard verify makes the
  * operator exact end-to-end. SetSimSpec pins both the brute-force
  * equality and the cross-operator containment q51 ⊆ q282 (banding
  * can only lose pairs, never invent them).
  *
  * The global order is rarity-first (df asc, shingle asc): prefixes
  * are the RAREST shingles, whose postings are the smallest — the
  * entire scale story (a boilerplate shingle never lands in a prefix
  * unless the doc is tiny). ⌈n/2⌉ = (n+1) div 2 and the
  * equivalent-overlap bound α = ⌈(nx+ny)/3⌉ = (nx+ny+2) div 3 are
  * integer-exact on both engines. The candidate join also applies
  * PPJoin's POSITIONAL upper bound — a match at 0-based positions
  * (pa, pb) can yield overlap at most min(nx−pa, ny−pb), which must
  * reach α; for a true pair the FIRST shared prefix token satisfies
  * it, so exactness is preserved while near-miss candidates die
  * before the verify.
  *
  * Scale shape (the q51/q241 content-group reshape): shingle sets,
  * rarity order, prefixes, candidates, and the exact verify all run
  * per DISTINCT content; doc-pair output re-expands through
  * membership equi-joins plus the within-group self-join (identical
  * sets, jac exactly 1.0). The oracle keeps the DOC-GRAIN prefix-join
  * rendering with a doc-grain rarity order — a genuinely independent
  * derivation: the engines build DIFFERENT prefixes, yet must emit
  * identical pairs, because prefix filtering is candidate-COMPLETE
  * under ANY consistent global order and the exact verify keeps
  * precisely the true ≥ t pairs. */
object SetSimQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** The shared content-grain PPJoin machinery — (members, groups
    * with rarity-sorted shingle lists, prefix rows, candidate pairs)
    * — factored so q282 (the exact pair join) and q287 (its
    * candidate-funnel telemetry) derive from the SAME code and can
    * never disagree on what a prefix or a candidate is. */
  private[operators] def ppjoinParts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // content groups over the planted dedup corpus (the q50/q51
    // family's shared input, so the q51-containment invariant is
    // apples-to-apples)
    val base = DedupQueries.corpus(t(s, dir, "documents"))
      .withColumn("nt", TextOps.norm(col("text")))
      .filter(col("nt").isNotNull)
      .select(col("doc_id"), md5(col("nt")).as("g"), col("nt"))
      .localCheckpoint()
    val members = base.select(col("doc_id"), col("g"))
    // round 21 (guide §2.4 "don't compute it twice"): grp feeds BOTH
    // the rarity table (df) and the sorted prefix table —
    // unmaterialized, the norm+shingleSet pass over every distinct
    // content ran twice per query (once per consumer); the checkpoint
    // computes it once and doubles as the pushdown barrier. sf0.1 A/B:
    // q282 2.97→2.07 s, q287 2.50→1.66 s. The aggregate input is
    // deliberately NOT shuffle-first/width-pinned: a probe that
    // repartitioned base by g before the groupBy shuffled the full
    // doc-grain fat-text frame (the map-side partial reduces it to one
    // row per distinct content first) and regressed q287 +0.65 s at
    // ×100 where replication is 100× — the partial-agg shape is the
    // scale path here.
    val grp = base.groupBy(col("g"))
      .agg(count(lit(1)).as("nd"), min(col("nt")).as("nt"))
      .withColumn("w", TextOps.shingleSet(split(col("nt"), " "), 5))
      .filter(size(col("w")) >= 1)
      .drop("nt")
      .localCheckpoint()
    // global rarity order from GROUP-grain shingle df
    val df = grp.select(col("g"), explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sorted = grp.select(col("g"), col("nd"),
        explode(col("w")).as("tok"))
      .join(df, "tok")
      .groupBy(col("g"), col("nd"))
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("tok")))),
        x => x.getField("tok")).as("w"))
      .withColumn("n", size(col("w")).cast(LongType))
      .withColumn("plen",
        col("n") - expr("(n + 1) div 2") + lit(1L))
      .localCheckpoint()
    val prefix = sorted.select(col("g"), col("n"),
      posexplode(slice(col("w"), lit(1),
        col("plen").cast(IntegerType))).as(Seq("pos", "tok")))
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.tok") === col("b.tok") && col("a.g") < col("b.g") &&
          col("b.n") <= col("a.n") * 2 &&
          col("a.n") <= col("b.n") * 2 &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))
            >= expr("(a.n + b.n + 2) div 3"))
      .select(col("a.g").as("g1"), col("b.g").as("g2"))
      .distinct()
    (members, sorted, prefix, cand)
  }

  private val q282 = Q(
    "q282_ppjoin_setsim",
    (s, dir) => {
      val (members, sorted, _, cand) = ppjoinParts(s, dir)
      val grp = sorted
      val crossPairs = cand
        .join(sorted.select(col("g").as("g1"), col("w").as("w1"),
          col("n").as("n1")), "g1")
        .join(sorted.select(col("g").as("g2"), col("w").as("w2"),
          col("n").as("n2")), "g2")
        .withColumn("inter",
          size(array_intersect(col("w1"), col("w2"))).cast(LongType))
        .withColumn("jac", col("inter").cast(DoubleType) /
          (col("n1") + col("n2") - col("inter")))
        .filter(col("jac") >= 0.5)
        .select(col("g1"), col("g2"), round(col("jac"), 6).as("jac"))
        .join(members.select(col("g").as("g1"), col("doc_id").as("x")),
          "g1")
        .join(members.select(col("g").as("g2"), col("doc_id").as("y")),
          "g2")
        .select(least(col("x"), col("y")).as("d1"),
          greatest(col("x"), col("y")).as("d2"), col("jac"))
      val intraPairs = members
        .join(grp.filter(col("nd") > 1).select(col("g")), "g")
        .alias("x")
        .join(members.alias("y"),
          col("x.g") === col("y.g") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          lit(1.0).as("jac"))
      crossPairs.unionByName(intraPairs)
    },
    Some(s"""
      WITH ${DedupQueries.shingleSql},
      sh1 AS (SELECT doc_id, sh FROM sh WHERE len(sh) >= 1),
      grpdf AS (
        SELECT tok, COUNT(*) AS gdf
        FROM (SELECT unnest(sh) AS tok FROM sh1) GROUP BY 1),
      srt AS (
        SELECT doc_id, list(tok ORDER BY gdf, tok) AS w,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT d.doc_id, tok, gdf
              FROM (SELECT doc_id, unnest(sh) AS tok FROM sh1) d
              JOIN grpdf USING (tok))
        GROUP BY 1),
      pre AS (
        SELECT doc_id, n, unnest(w[1:(n - (n + 1) // 2 + 1)]) AS tok
        FROM srt),
      cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM pre a JOIN pre b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
           AND b.n <= a.n * 2 AND a.n <= b.n * 2),
      v AS (
        SELECT d1, d2,
               CAST(len(list_intersect(s1.w, s2.w)) AS BIGINT) AS inter,
               s1.n AS n1, s2.n AS n2
        FROM cand
        JOIN srt s1 ON s1.doc_id = d1
        JOIN srt s2 ON s2.doc_id = d2)
      SELECT d1, d2,
             round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) AS jac
      FROM v WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.5
      """))

  /** q287 — the PPJoin candidate FUNNEL as first-class telemetry
    * (round-16 advice #6, step 1 of the suffix-filter decision): how
    * many content groups enter, how many prefix rows they emit, how
    * many distinct candidate pairs survive the length + positional
    * bounds, how many verify at jac ≥ 0.5, and the doc-pair masses —
    * computed FROM GROUP SIZES (Σ nd₁·nd₂ over verified pairs +
    * Σ nd·(nd−1)/2 over multi-doc groups), never materializing doc
    * pairs (the q276 stats discipline). This is the number a
    * deployment reads before deciding whether suffix filtering is
    * worth adding: if n_cand_pairs ≫ n_verified, the verify stage
    * dominates and a tighter filter pays.
    *
    * Shares [[ppjoinParts]] with q282 — telemetry and the exact join
    * can never disagree on what a candidate is. Unlike q282's
    * deliberately doc-grain oracle, this oracle MIRRORS the
    * content-grain derivation (candidate counts are grain-specific,
    * so an independent doc-grain rendering would measure a different
    * funnel). */
  private val q287 = Q(
    "q287_ppjoin_telemetry",
    (s, dir) => {
      val (_, sorted, prefix, cand) = ppjoinParts(s, dir)
      val candStats = cand
        .join(sorted.select(col("g").as("g1"), col("w").as("w1"),
          col("n").as("n1"), col("nd").as("nd1")), "g1")
        .join(sorted.select(col("g").as("g2"), col("w").as("w2"),
          col("n").as("n2"), col("nd").as("nd2")), "g2")
        .withColumn("inter",
          size(array_intersect(col("w1"), col("w2"))).cast(LongType))
        .withColumn("ok",
          col("inter").cast(DoubleType) /
            (col("n1") + col("n2") - col("inter")) >= 0.5)
        .agg(
          graft.functions.Exprs.asLong(count(lit(1)))
            .as("n_cand_pairs"),
          coalesce(graft.functions.Exprs.asLong(
            sum(when(col("ok"), 1L).otherwise(0L))), lit(0L))
            .as("n_verified"),
          coalesce(sum(when(col("ok"), col("nd1") * col("nd2")))
            .cast(LongType), lit(0L)).as("n_cross_doc_pairs"))
      val grpStats = sorted.agg(
        graft.functions.Exprs.asLong(count(lit(1))).as("n_groups"),
        sum(col("plen")).cast(LongType).as("n_prefix_rows"),
        coalesce(sum(when(col("nd") > 1,
          expr("nd * (nd - 1) div 2"))).cast(LongType), lit(0L))
          .as("n_intra_doc_pairs"))
      val tokStats = prefix.groupBy(col("tok"))
        .agg(count_distinct(col("g")).as("m"))
        .agg(graft.functions.Exprs.asLong(count(lit(1)))
          .as("n_prefix_tokens"),
          graft.functions.Exprs.asLong(
            sum(when(col("m") > 1, 1L).otherwise(0L)))
            .as("n_active_tokens"))
      grpStats.crossJoin(broadcast(candStats))
        .crossJoin(broadcast(tokStats))
    },
    Some(s"""
      WITH ${DedupQueries.corpusSql},
      memb AS (
        SELECT doc_id, md5(nt) AS h, nt
        FROM (SELECT doc_id,
                     regexp_replace(trim(lower(text)),'\\s+',' ','g') AS nt
              FROM corpus)
        WHERE nt IS NOT NULL),
      grp0 AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS nd, MIN(nt) AS nt
               FROM memb GROUP BY 1),
      gsh AS (
        SELECT h, nd,
               list_distinct([array_to_string(w[i+1:i+5],' ')
                              FOR i IN range(len(w)-4)]) AS sh
        FROM (SELECT h, nd, string_split(nt, ' ') AS w FROM grp0)),
      g1 AS (SELECT h, nd, sh FROM gsh WHERE len(sh) >= 1),
      gdf AS (
        SELECT tok, COUNT(*) AS df
        FROM (SELECT unnest(sh) AS tok FROM g1) GROUP BY 1),
      srt AS (
        SELECT h, nd, list(tok ORDER BY df, tok) AS w,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT g.h, g.nd, tok, df
              FROM (SELECT h, nd, unnest(sh) AS tok FROM g1) g
              JOIN gdf USING (tok))
        GROUP BY 1, 2),
      srt2 AS (SELECT h, nd, w, n,
                      n - (n + 1) // 2 + 1 AS plen FROM srt),
      pre AS (
        SELECT h, n, unnest(w[1:plen]) AS tok,
               unnest(range(plen)) AS pos
        FROM srt2),
      cand AS (
        SELECT DISTINCT a.h AS ga, b.h AS gb
        FROM pre a JOIN pre b
        ON a.tok = b.tok AND a.h < b.h
           AND b.n <= a.n * 2 AND a.n <= b.n * 2
           AND least(a.n - a.pos, b.n - b.pos) >= (a.n + b.n + 2) // 3),
      v AS (
        SELECT ga, gb, s1.nd AS nd1, s2.nd AS nd2,
               CAST(len(list_intersect(s1.w, s2.w)) AS DOUBLE) /
                 (s1.n + s2.n - len(list_intersect(s1.w, s2.w))) AS jac
        FROM cand
        JOIN srt2 s1 ON s1.h = ga
        JOIN srt2 s2 ON s2.h = gb),
      cs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
               CAST(COALESCE(SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END),
                 0) AS BIGINT) AS n_verified,
               CAST(COALESCE(SUM(CASE WHEN jac >= 0.5
                 THEN nd1 * nd2 END), 0) AS BIGINT) AS n_cross_doc_pairs
        FROM v),
      gs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(plen) AS BIGINT) AS n_prefix_rows,
               CAST(COALESCE(SUM(CASE WHEN nd > 1
                 THEN nd * (nd - 1) // 2 END), 0) AS BIGINT)
                 AS n_intra_doc_pairs
        FROM srt2),
      ts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_prefix_tokens,
               CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_active_tokens
        FROM (SELECT tok, COUNT(DISTINCT h) AS m FROM pre GROUP BY 1))
      SELECT * FROM gs, cs, ts
    """))

  val registry: Seq[Q] = Seq(q282, q287)
}
