package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-13 LM-curation wave (q252 CCNet-style
  * perplexity buckets, q253 DSIR importance selection). The oracle loop
  * proves engine parity; these pin the SEMANTICS the SQL alone doesn't
  * make obvious: terciles partition each language exactly, bucket
  * quality ordering, token-count conservation against an independent
  * tokenizer pass, and the DSIR enrichment claim (the curated target
  * tier must dominate the top-weight slice — the entire point of
  * importance resampling).
  */
class LmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  /** Per-language max multiplicity of a rounded (4-dp) ce value in
    * q252's own per-doc frame — the tie mass that can legally skew the
    * tercile cut. */
  private def ceMultiplicity(lang: String): Long =
    LmQueries.docCeFrame(spark, dir)
      .filter(col("lang") === lang)
      .groupBy(col("ce")).agg(count(lit(1)).as("m"))
      .agg(max(col("m"))).collect().head.getLong(0)

  test("q252 terciles partition each language's documents exactly") {
    val out = run("q252_lm_perplexity_buckets")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // independent per-lang doc/token counts (whitespace tokenizer)
    val docs = graft.Tables.load(graft.Tables.tuned(spark), dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(size(graft.functions.TextOps.words(col("text")))).as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val langs = out.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    for (l <- langs) {
      val buckets = Seq("head", "middle", "tail").map(b => out((l, b)))
      assert(buckets.map(_._1).sum == docs(l)._1,
        s"$l: tercile doc counts must partition the language")
      assert(buckets.map(_._2).sum == docs(l)._2,
        s"$l: tercile token counts must conserve the language total")
      // a tercile is a third — but the cut compares ROUNDED ce against
      // exact percentiles and sends boundary ties to the lower bucket,
      // so a duplicated 4-dp ce at a boundary legitimately skews the
      // split. Bound the skew by the measured tie multiplicity (each of
      // the two boundaries can misplace at most m-1 tied docs) instead
      // of a hard <=1 that only holds on tie-free fixtures.
      val sizes = buckets.map(_._1)
      val m = ceMultiplicity(l)
      assert(sizes.max - sizes.min <= 1 + 2 * (m - 1),
        s"$l: tercile balance $sizes exceeds tie bound (max ce multiplicity $m)")
    }
  }

  test("q252 bucket quality ordering: head < middle < tail mean ce") {
    val out = run("q252_lm_perplexity_buckets")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    val langs: Set[String] = out.keys.map(_._1).toSet
    for (l <- langs) {
      assert(out((l, "head")) < out((l, "middle")),
        s"$l: head must out-score middle")
      assert(out((l, "middle")) < out((l, "tail")),
        s"$l: middle must out-score tail")
    }
  }

  test("q253 top-weight slice is dominated by the curated target tier") {
    val rows = run("q253_dsir_selection").collect()
    assert(rows.length == 20)
    val ws = rows.map(r => (r.getDouble(3), r.getLong(0)))
    // the registry's total order: weight desc, doc_id asc
    assert(ws.sameElements(ws.sortBy { case (w, id) => (-w, id) }))
    val curated = rows.count(r =>
      Set("src0", "src1", "src2", "src3")(r.getString(1)))
    // target tier is 4 of 20 sources (~20% base rate); importance
    // weighting must concentrate it in the head — anything under 60%
    // would mean the hashed-ngram model carries no signal
    assert(curated >= 12, s"curated-tier docs in top-20: $curated")
  }
}
