package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass GRAM/COVARIANCE accumulator (the custom-`Aggregator`
  * preference level, like [[TopKAggregator]]): folds each quantized
  * d-vector's upper-triangle outer product, per-dimension sums and row
  * count into ONE flat Long buffer of size d(d+1)/2 + d + 1, merged
  * associatively across partitions.
  *
  * This replaces the explode formulation (`VectorsPca.gramCore`, kept
  * as the equivalence reference) in the hot path: exploding emits
  * d(d+1)/2 struct ROWS per input row — billions of rows through the
  * aggregate at probe scale — where this buffer does the same
  * multiply-adds in a tight primitive loop with zero row churn. The
  * shuffle carries ONE ~17 KB buffer per partition (map-side partial),
  * the smallest possible exchange for this computation; every sum is
  * an exact BIGINT, so the result is bit-identical to the explode plan
  * and the DuckDB oracle under any partitioning.
  *
  * Buffer layout: [0, T) pair sums (T = d(d+1)/2, row-major upper
  * triangle), [T, T+d) per-dimension sums, [T+d] row count.
  */
class GramAggregator(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(d >= 1, s"dimension must be >= 1, got $d")
  private val T = d * (d + 1) / 2

  def zero: Array[Long] = new Array[Long](T + d + 1)

  def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
    require(q.length == d, s"expected $d dims, got ${q.length}")
    val a = q.toArray
    var t = 0
    var i = 0
    while (i < d) {
      val qi = a(i)
      var j = i
      while (j < d) { buf(t) += qi * a(j); t += 1; j += 1 }
      buf(T + i) += qi
      i += 1
    }
    buf(T + d) += 1L
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
