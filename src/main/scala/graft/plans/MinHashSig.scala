package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-component MinHash signature over a shingle array:
  * component i = min over shingles of `md5("<i>|" + shingle)` as
  * lowercase hex — identical math to [[graft.functions.TextOps.minhash]]
  * (`array_min(transform(sh, x => md5(concat("<i>|", x))))`), so DuckDB
  * `list_min([md5('<i>|'||s) FOR s IN sh])` oracles reproduce it
  * byte-for-byte.
  *
  * Why native: the HOF formulation evaluates k separate interpreted
  * `transform` lambdas (one Column per component), each allocating a
  * hex string per shingle. This expression makes ONE pass over the
  * shingles, reuses a thread-local MessageDigest, keeps the running
  * minima as raw digest bytes (hex lexicographic order == unsigned
  * byte order), and hex-encodes only the k final minima. Empty shingle
  * arrays yield null components (array_min-over-empty semantics).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"minhash signature width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sh =>
      s"${ev.value} = graft.plans.MinHashSig.signature($sh, $k);")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {

  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".getBytes

  /** Unsigned lexicographic byte-array compare (== hex-string order). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Per-width cache of the "<i>|" salt prefixes as bytes — computed
    * once per JVM instead of once per (shingle, component). */
  private val saltCaches =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def salts(k: Int): Array[Array[Byte]] =
    saltCaches.computeIfAbsent(k,
      kk => Array.tabulate(kk)(s => (s.toString + "|").getBytes))

  /** Shared by interpreted eval and generated code (public +
    * Java-callable from codegen'd classes). The inner loop is
    * allocation-free: salt prefixes are cached, the digest writes into
    * a reused buffer, and minima copy bytes only when they improve. */
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val minima = new Array[Array[Byte]](k)
    val md = digest.get()
    val saltBytes = salts(k)
    val buf = new Array[Byte](16)
    var i = 0
    while (i < n) {
      val shingleBytes = shingles.getUTF8String(i).getBytes
      var s = 0
      while (s < k) {
        md.reset()
        md.update(saltBytes(s))
        md.update(shingleBytes)
        md.digest(buf, 0, 16)
        if (minima(s) == null) minima(s) = java.util.Arrays.copyOf(buf, 16)
        else if (less(buf, minima(s)))
          System.arraycopy(buf, 0, minima(s), 0, 16)
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = if (minima(s) == null) null else hex(minima(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  import org.apache.spark.sql.GraftColumnBridge

  /** Column API over the expression. */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(shingles), k))
}
