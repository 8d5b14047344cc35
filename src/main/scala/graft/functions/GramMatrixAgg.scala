package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed, mergeable Gram-matrix aggregator: accumulates
  * M = sum over rows of x·xᵀ for fixed-point integer vectors x of
  * length `dim`, flattened row-major to an Array[Long](dim*dim).
  *
  * This is the scale shape for corpus-level second-moment/PCA work:
  * the naive relational form (posexplode to (i, x_i), self-join on
  * the row id, groupBy (i, j)) shuffles n·dim² rows — 2×10⁹ at the
  * ×100 fixture and unbounded at 100 TB — whereas this Aggregator
  * computes the dim² products in a tight in-memory loop per row and
  * shuffles exactly ONE dim²-long array per partition (32 KB at
  * dim=64). reduce/merge are associative+commutative integer adds,
  * so the result is order-independent and bit-identical to the SQL
  * oracle's pair aggregation.
  *
  * Overflow bound: |x_i| ≤ 2¹⁵ fixed-point units and n ≤ 2²² rows
  * per the caller keeps |Σ x_i·x_j| < 2^52; the embedding corpus
  * (milli-units ≤ ~2·10³, n ≤ 10⁹) stays far below long range.
  */
class GramMatrix(dim: Int)
  extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.ofDim[Long](dim * dim)

  override def reduce(buf: Array[Long], x: Seq[Long]): Array[Long] = {
    val xs = x.toArray
    var i = 0
    while (i < dim) {
      val xi = xs(i)
      if (xi != 0L) {
        val base = i * dim
        var j = 0
        while (j < dim) { buf(base + j) += xi * xs(j); j += 1 }
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
