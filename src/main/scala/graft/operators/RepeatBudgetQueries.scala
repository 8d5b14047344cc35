package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.{Exprs, TextOps}

/** q288 — data-constrained REPEAT-BUDGET allocation (the
  * Muennighoff-style "how many epochs of each source" decision a
  * token-limited pretraining run makes once the unique corpus is
  * smaller than the compute budget): given per-source unique token
  * masses a_s and per-source repeat ceilings cap_s (quality tiers —
  * high-quality sources tolerate more epochs before diminishing
  * returns), spend a total budget B by WATERFILLING: every uncapped
  * source repeats at one common rate λ, sources whose ceiling is
  * below λ sit at their ceiling, and λ is the unique level that
  * exhausts the budget. This composes with q218's temperature mixing
  * (which reweights WITHIN a fixed budget) by deciding the budget
  * split itself under repetition limits.
  *
  * Exactness: all algebra runs in integer micro-epoch units (the RRF
  * micro-unit discipline). Caps are integral in µ-epochs, so the
  * floor-divided candidate level λ_u(k) = (B_u − Σ_{capped} cap·a)
  * div Σ_{uncapped} a preserves the waterfill bracket
  * cap_k ≤ λ_u < cap_{k+1} — exactly ONE breakpoint validates (the
  * last row of a tied-cap block), or none when the budget exceeds
  * every ceiling (all-capped fallback, remainder reported).
  * RepeatBudgetSpec pins budget conservation, cap dominance, the
  * common-λ property, and a closed-form two-source case.
  *
  * Scale shape (the q283 discipline): the ONLY corpus-scale work is
  * one tokenize + per-source sum (map-side combinable, one shuffle
  * on source); the waterfill runs on the |sources|-row config frame
  * (unpartitioned windows there carry the RegistrySmokeSpec
  * constant-bound proof — a production source registry is thousands
  * of rows at most). Caps here derive from a deterministic hash of
  * the source name as the quality-tier config stand-in (2–5 epochs);
  * a deployment would join its real tier table instead. */
object RepeatBudgetQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  private val M = 1000000L // micro-epoch scale
  private val BudgetEpochs = 3L // budget = 3 × unique corpus mass

  private val q288 = Q(
    "q288_repeat_budget",
    (s, dir) => {
      val perSrc = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"),
          size(TextOps.words(col("text"))).cast(LongType).as("ntok"))
        .groupBy(col("source"))
        .agg(sum(col("ntok")).as("a"))
        .filter(col("a") > 0)
        .withColumn("cap_u",
          (lit(2L) + pmod(Exprs.md5Int32(col("source")), lit(4L))) * M)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val wSort = Window.orderBy(col("cap_u"), col("source"))
      val wPref = wSort.rowsBetween(Window.unboundedPreceding, 0)
      val rows = perSrc
        .withColumn("bu", sum(col("a")).over(wAll) * (BudgetEpochs * M))
        .withColumn("pref_cap", sum(col("cap_u") * col("a")).over(wPref))
        .withColumn("suf_a",
          sum(col("a")).over(wAll) - sum(col("a")).over(wPref))
        .withColumn("next_cap",
          lead(col("cap_u"), 1).over(wSort))
        .withColumn("max_cap", max(col("cap_u")).over(wAll))
      // candidate λ_u per breakpoint "this row and everything before
      // it is capped"; plus the k=0 virtual breakpoint (nothing
      // capped) evaluated on the first sorted row
      val firstRow = rows
        .withColumn("rn", row_number().over(wSort)).filter(col("rn") === 1)
        .select(expr("bu div (suf_a + a)").as("lam"),
          col("cap_u").as("next0"))
        .select(when(col("lam") < col("next0"), col("lam")).as("lam0"))
      val cands = rows.select(
        when(
          expr("(bu - pref_cap) div suf_a") >= col("cap_u") &&
            (col("next_cap").isNull ||
              expr("(bu - pref_cap) div suf_a") < col("next_cap")) &&
            col("suf_a") > 0,
          expr("(bu - pref_cap) div suf_a")).as("lamk"),
        col("max_cap"))
        .agg(max(col("lamk")).as("lam_pos"), max(col("max_cap")).as("mc"))
        .crossJoin(broadcast(firstRow))
        .select(coalesce(col("lam0"), col("lam_pos"), col("mc"))
          .as("lambda_u"))
      val alloc = perSrc.crossJoin(broadcast(cands))
        .withColumn("alloc_u", least(col("lambda_u"), col("cap_u")))
        .withColumn("alloc_tokens", expr("(alloc_u * a) div 1000000"))
        .withColumn("capped", col("cap_u") <= col("lambda_u"))
      alloc
        .withColumn("budget_tokens",
          sum(col("a")).over(wAll) * BudgetEpochs)
        .withColumn("spent_tokens", sum(col("alloc_tokens")).over(wAll))
        .select(col("source"), col("a").as("a_tokens"), col("cap_u"),
          col("lambda_u"), col("alloc_u"), col("alloc_tokens"),
          col("capped"), col("budget_tokens"),
          (col("budget_tokens") - col("spent_tokens"))
            .as("remainder_tokens"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH tok AS (
        SELECT source,
               CAST(len(string_split(regexp_replace(trim(lower(text)),
                 '\\s+',' ','g'),' ')) AS BIGINT) AS ntok
        FROM documents WHERE text IS NOT NULL),
      per_src AS (
        SELECT source, CAST(SUM(ntok) AS BIGINT) AS a,
               (2 + ('0x' || substr(md5(source), 1, 8))::BIGINT % 4)
                 * ${M} AS cap_u
        FROM tok GROUP BY 1 HAVING SUM(ntok) > 0),
      tot AS (SELECT SUM(a) AS ta FROM per_src),
      srt AS (
        SELECT source, a, cap_u,
               row_number() OVER w AS rn,
               SUM(cap_u * a) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS pref_cap,
               (SELECT ta FROM tot) -
                 SUM(a) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS suf_a,
               lead(cap_u) OVER w AS next_cap
        FROM per_src
        WINDOW w AS (ORDER BY cap_u, source)),
      bu AS (SELECT ta * ${BudgetEpochs * M} AS b FROM tot),
      lam0 AS (
        SELECT CASE WHEN (SELECT b FROM bu) // (SELECT ta FROM tot)
                      < cap_u
               THEN (SELECT b FROM bu) // (SELECT ta FROM tot) END AS l
        FROM srt WHERE rn = 1),
      lamk AS (
        SELECT MAX(CASE WHEN suf_a > 0
                 AND ((SELECT b FROM bu) - pref_cap) // suf_a >= cap_u
                 AND (next_cap IS NULL OR
                      ((SELECT b FROM bu) - pref_cap) // suf_a < next_cap)
               THEN ((SELECT b FROM bu) - pref_cap) // suf_a END) AS l
        FROM srt),
      lam AS (
        SELECT COALESCE((SELECT l FROM lam0), (SELECT l FROM lamk),
                 (SELECT MAX(cap_u) FROM per_src)) AS lambda_u),
      alloc AS (
        SELECT source, a, cap_u, lambda_u,
               least(lambda_u, cap_u) AS alloc_u,
               (least(lambda_u, cap_u) * a) // ${M} AS alloc_tokens,
               cap_u <= lambda_u AS capped
        FROM per_src, lam)
      SELECT source, a AS a_tokens, CAST(cap_u AS BIGINT) AS cap_u,
             CAST(lambda_u AS BIGINT) AS lambda_u,
             CAST(alloc_u AS BIGINT) AS alloc_u,
             CAST(alloc_tokens AS BIGINT) AS alloc_tokens, capped,
             CAST((SELECT ta FROM tot) * ${BudgetEpochs} AS BIGINT)
               AS budget_tokens,
             CAST((SELECT ta FROM tot) * ${BudgetEpochs} -
               (SELECT SUM(alloc_tokens) FROM alloc) AS BIGINT)
               AS remainder_tokens
      FROM alloc ORDER BY source
    """))

  val registry: Seq[Q] = Seq(q288)
}
