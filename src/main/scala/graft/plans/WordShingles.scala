package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word n-gram shingling:
  * `["a","b","c","d"]` with n=3 → `["a b c", "b c d"]`.
  *
  * The built-in formulation
  * `transform(sequence(0, size(w)-n), i -> array_join(slice(w, i+1, n), " "))`
  * is semantically identical but pathological at scale: higher-order
  * functions are excluded from whole-stage codegen and its subexpression
  * elimination, so when `w` is itself an expression (the usual
  * `split(normalize(text))`), the tokenize pipeline re-runs once per
  * shingle index per occurrence — and the optimizer's
  * infer-filter-from-generate duplicates the whole expression again into
  * a pre-explode filter. Measured on the sf0.1 documents corpus that
  * formulation costs ~10 s where this single-pass expression costs
  * ~0.3 s.
  *
  * Shingles are emitted in document order; with `distinct = true`,
  * first-occurrence order (exactly `array_distinct`'s semantics, and
  * DuckDB `list_distinct`-compatible as a set). Documents shorter than
  * `n` words yield an empty array.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.plans.WordShingles.shingle($w, $n, $distinct);")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {

  private val Space = UTF8String.fromString(" ")

  /** Single-pass shingle builder, shared by interpreted eval and
    * generated code (must be public + Java-callable from codegen'd
    * classes). */
  def shingle(words: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val count = len - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(joinFrom(words, i, n))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = joinFrom(words, i, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def joinFrom(words: ArrayData, start: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      parts(j) = words.getUTF8String(start + j)
      j += 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  import org.apache.spark.sql.GraftColumnBridge

  /** Column API over the expression. */
  def shingles(words: Column, n: Int, distinct: Boolean = false): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(words), n, distinct))
}
