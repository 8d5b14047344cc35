package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed, mergeable MinHash-signature aggregator (SURVEY §2.9: the one
  * custom-aggregate candidate — a mergeable sketch state).
  *
  * IN = one shingle string; BUF/OUT = the k-component signature
  * (element-wise min of salted md5 hex strings). The buffer is
  * associative and commutative, so Spark computes partial signatures
  * map-side and merges across partitions — the signature of a billion
  * shingles is one k-string buffer per group, never a collected set.
  * Identical math to TextOps.minhash, so SQL oracles reproduce it.
  */
class MinHashSignature(k: Int) extends Aggregator[String, Array[String], Array[String]] {

  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def h(salt: Int, shingle: String): String = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s"$salt|$shingle".getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var i = 0
    while (i < k) {
      val hv = h(i, shingle)
      if (buf(i) == null || hv < buf(i)) buf(i) = hv
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
