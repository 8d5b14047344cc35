package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopK]]'s list-valued sibling: keeps the k (sortKey, payload)
  * entries with the LARGEST sortKey (tiebreak: smaller payload head
  * first — deterministic for the capped-posting use, where payloads
  * are distinct ascending id lists and the sort key is −min(id)).
  *
  * Why it exists (round-18): the capped-posting kernel's second TopK
  * ran over EXPLODED (shingle, doc_id) rows — ~contents×cap rows per
  * corpus. The contributor bound ("a shingle's k lowest doc ids come
  * from the ≤k contents with the smallest min member id") lets the
  * heap run over CONTENT rows instead, k-bounded state per group as
  * before, with the final doc-grain cap a native
  * flatten+sort+slice over ≤k·cap elements per shingle.
  */
class TopKLists(k: Int)
  extends Aggregator[(Long, Seq[Long]), Array[(Long, Seq[Long])],
    Array[(Long, Seq[Long])]] {

  private def beats(a: (Long, Seq[Long]), b: (Long, Seq[Long])): Boolean =
    a._1 > b._1 || (a._1 == b._1 &&
      a._2.headOption.getOrElse(Long.MaxValue) <
        b._2.headOption.getOrElse(Long.MaxValue))

  override def zero: Array[(Long, Seq[Long])] = Array.empty

  override def reduce(buf: Array[(Long, Seq[Long])],
      x: (Long, Seq[Long])): Array[(Long, Seq[Long])] = {
    if (buf.length == k && !beats(x, buf(k - 1))) buf
    else {
      val out = (buf :+ x).sortWith(beats)
      if (out.length > k) out.take(k) else out
    }
  }

  override def merge(a: Array[(Long, Seq[Long])],
      b: Array[(Long, Seq[Long])]): Array[(Long, Seq[Long])] = {
    val out = (a ++ b).sortWith(beats)
    if (out.length > k) out.take(k) else out
  }

  override def finish(buf: Array[(Long, Seq[Long])])
      : Array[(Long, Seq[Long])] = buf

  override def bufferEncoder: Encoder[Array[(Long, Seq[Long])]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[(Long, Seq[Long])]]()

  override def outputEncoder: Encoder[Array[(Long, Seq[Long])]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[(Long, Seq[Long])]]()
}
