package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed, mergeable grouped top-k aggregator.
  *
  * The reference's only top-k is the driver-side KNN loop
  * (api_server/api.py:119); relationally, grouped top-k is usually
  * written as a window ROW_NUMBER + filter, which shuffles EVERY row
  * of every group. This Aggregator keeps a bounded k-element buffer
  * ordered by (value DESC, tiebreak ASC); reduce/merge are
  * associative and commutative, so Spark computes partial top-k
  * map-side and shuffles at most k rows per partition per group —
  * the difference between shuffling 100 TB and shuffling
  * k x partitions x groups rows. The deterministic tiebreak makes the
  * result identical to the window formulation, which is exactly what
  * the SQL oracle runs.
  *
  * IN = (value, tiebreak); BUF = OUT = the top-k pairs, ordered.
  */
class TopK(k: Int)
  extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {

  // (v, t) ranks before (v2, t2) iff v > v2, or v == v2 && t < t2
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(
      buf: Array[(Long, Long)], x: (Long, Long)): Array[(Long, Long)] = {
    if (buf.length == k && !beats(x, buf(k - 1))) buf
    else {
      // insertion into a <=k sorted array: O(k) per row, k is small
      val out = (buf :+ x).sortWith(beats)
      if (out.length > k) out.take(k) else out
    }
  }

  override def merge(
      a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val out = (a ++ b).sortWith(beats)
    if (out.length > k) out.take(k) else out
  }

  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()

  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}
