package graft

/** The shared JVM mirror of the TextOps.norm normalization CONTRACT,
  * for brute-force spec oracles. Deliberately NOT Java's defaults —
  * the contract is the engine-portable intersection PropertySpec pins
  * against TextOps and tools/nasty_check.py pins against DuckDB:
  *
  *   - whitespace class is EXPLICIT `[ \t\n\f\r]` (Java's `\s` also
  *     matches U+000B, which RE2/DuckDB's does not);
  *   - trim strips ' ' only (Spark's `trim` semantics; Java's
  *     String.trim strips every code point <= U+0020);
  *   - the two Java-full-vs-utf8proc-simple case-mapping hazard chars
  *     U+0130 İ and U+03A3 Σ are pre-mapped exactly as TextOps.norm's
  *     `translate` does;
  *   - tokenization is `split(" ", -1)` (Spark's split keeps trailing
  *     empty fields; Java's 1-arg split drops them).
  *
  * Every spec brute-forcing a text-keyed query must tokenize through
  * THIS object, never through String.trim / `\s` / bare split — a
  * Java-semantics mirror silently diverges on exotic whitespace
  * (round-11 finding, VERDICT r11 advice item 4).
  */
object TestTextRef {

  /** Mirror of [[graft.functions.TextOps.norm]]. */
  def norm(s: String): String =
    s.map { case 'İ' => 'i'; case 'Σ' => 'σ'; case c => c }
      .mkString
      .toLowerCase(java.util.Locale.ROOT)
      .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      .replaceAll("[ \t\n\f\r]+", " ")

  /** Mirror of [[graft.functions.TextOps.words]]. */
  def words(s: String): Array[String] = norm(s).split(" ", -1)
}
