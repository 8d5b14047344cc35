package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column builders for the large-scale training-data
  * pipeline ops (dedup, language-ID, quality scoring, token counting,
  * fingerprinting). Everything is built from codegen'd built-ins —
  * no UDFs — and every hash is md5-based so DuckDB oracles can
  * reproduce it byte-for-byte (see Exprs.md5Int32).
  */
object TextOps {

  /** Normalize: lowercase, trim, collapse whitespace runs.
    *
    * The whitespace class is EXPLICIT — `[ \t\n\f\r]`, the set RE2's
    * `\s` matches — because Java's `\s` additionally matches vertical
    * tab U+000B, which DuckDB (RE2) keeps: a `\s+` rendering here
    * silently diverged from every oracle on \x0B-bearing text
    * (measured round 11; no fixture carries \x0B, so published hashes
    * are unchanged). Likewise the `translate` pre-maps the only two
    * code points where Java's FULL case mapping (used by Spark's
    * `lower`) disagrees with utf8proc's SIMPLE mapping (used by
    * DuckDB's): U+0130 İ (Java: i + combining dot; simple: i) and
    * final-position U+03A3 Σ (Java: ς by the Final_Sigma rule;
    * simple: σ always). Both engines now produce identical
    * normalization over the full UTF-8 plane — PropertySpec's
    * adversarial generators pin this against a JVM mirror, and the
    * nasty-fixture DuckDB differential (tools/nasty_check.py) pins
    * the engine pair end-to-end. */
  def norm(c: Column): Column =
    regexp_replace(trim(lower(translate(c, "İΣ", "iσ"))),
      "[ \\t\\n\\f\\r]+", " ")

  /** Whitespace tokenization of normalized text. */
  def words(c: Column): Column = split(norm(c), " ")

  /** Word n-gram shingles: ["a b c","b c d",...]; empty when the doc is
    * shorter than n; null words → null. Native single-pass expression —
    * see [[graft.plans.WordShingles]] for why the transform/sequence/
    * slice HOF formulation is quadratic in practice. */
  def shingles(w: Column, n: Int): Column =
    graft.plans.WordShingles.shingles(w, n)

  /** Distinct shingle set (first-occurrence order — `array_distinct`
    * semantics) in the same single pass. */
  def shingleSet(w: Column, n: Int): Column =
    graft.plans.WordShingles.shingles(w, n, distinct = true)

  /** One MinHash signature component: min over shingles of a salted md5.
    * The lexicographic min over hex strings is a valid uniform min-hash
    * and — unlike integer hash mixing — is reproducible in any engine
    * with md5. */
  def minhash(sh: Column, salt: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"$salt|"), x))))

  /** Count of tokens drawn from a fixed vocabulary (stopword counting,
    * language-marker scoring). */
  def vocabHits(w: Column, vocab: Seq[String]): Column =
    size(filter(w, x => x.isin(vocab: _*)))

  /** Content-defined fingerprint: md5 of the sorted distinct vocabulary
    * of the document (word-order independent — catches reshuffled
    * near-identical docs). */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(words(c))), " "))

  /** SimHash over the distinct words of a document, `bits` wide.
    * Per bit b: the bit is set iff the majority of word-hashes have bit
    * b set. Implemented as a generated expression (one filter/count per
    * bit) shared verbatim — modulo function names — with the DuckDB
    * oracle; see [[simhashSparkExpr]] / [[simhashDuckExpr]].
    */
  def simhashSparkExpr(textCol: String, bits: Int): String = {
    val hw = s"transform(array_distinct(split($textCol, ' ')), " +
      "w -> cast(conv(substring(md5(w),1,8),16,10) as bigint))"
    val nw = s"size(array_distinct(split($textCol, ' ')))"
    simhashTerms(hw, nw, bits, sizeFn = "size", filterFn = "filter",
      intDiv = "div")
  }

  /** Same formula over precomputed word-hash-array / word-count columns
    * (avoids re-hashing the words once per bit — 32x less md5 work for
    * a 32-bit signature). */
  def simhashSparkExprOver(hwCol: String, nwCol: String, bits: Int): String =
    simhashTerms(hwCol, nwCol, bits, sizeFn = "size", filterFn = "filter",
      intDiv = "div")

  /** The word-hash array / distinct-word-count Spark SQL fragments. */
  def wordHashSparkExpr(
      textCol: String, hexDigits: Int = 8): (String, String) = (
    s"transform(array_distinct(split($textCol, ' ')), " +
      s"w -> cast(conv(substring(md5(w),1,$hexDigits),16,10) as bigint))",
    s"size(array_distinct(split($textCol, ' ')))")

  private def simhashTerms(hw: String, nw: String, bits: Int,
      sizeFn: String, filterFn: String, intDiv: String): String =
    (0 until bits).map { b =>
      val p = 1L << b
      val div = if (intDiv == "div") s"h div $p" else s"h//$p"
      s"(CASE WHEN 2*$sizeFn($filterFn($hw, h -> ($div) % 2 = 1)) > $nw " +
        s"THEN CAST($p AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** DuckDB rendering of the identical simhash formula. */
  def simhashDuckExpr(textCol: String, bits: Int): String = {
    val hw = s"[CAST(('0x'||substr(md5(w),1,8)) AS BIGINT) " +
      s"FOR w IN list_distinct(string_split($textCol, ' '))]"
    val nw = s"len(list_distinct(string_split($textCol, ' ')))"
    simhashTerms(hw, nw, bits, sizeFn = "len", filterFn = "list_filter",
      intDiv = "//")
  }

  /** DuckDB simhash over precomputed hw/nw columns. */
  def simhashDuckExprOver(hwCol: String, nwCol: String, bits: Int): String =
    simhashTerms(hwCol, nwCol, bits, sizeFn = "len",
      filterFn = "list_filter", intDiv = "//")

  /** The word-hash / word-count DuckDB SQL fragments.
    * `hexDigits` sets the hash width (4 bits per digit). */
  def wordHashDuckExpr(textCol: String, hexDigits: Int = 8): (String, String) = (
    s"[CAST(('0x'||substr(md5(w),1,$hexDigits)) AS BIGINT) " +
      s"FOR w IN list_distinct(string_split($textCol, ' '))]",
    s"len(list_distinct(string_split($textCol, ' ')))")

  /** Wide (60-bit) word hashes — 15 md5 hex digits — for signatures
    * beyond 32 bits. 60, not 64: neither engine's shift/arithmetic
    * ever touches the Long sign bit. */
  def wordHashSparkExprWide(textCol: String): (String, String) =
    wordHashSparkExpr(textCol, hexDigits = 15)

  /** DuckDB rendering of [[wordHashSparkExprWide]]. */
  def wordHashDuckExprWide(textCol: String): (String, String) =
    wordHashDuckExpr(textCol, hexDigits = 15)
}
