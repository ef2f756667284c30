package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (SURVEY §7 v5: the custom `Aggregator` for
  * vector top-k): keeps the k highest-scoring (id, score) pairs per
  * group in a fixed-size buffer, so ranking needs no WindowExec sort —
  * the reduction is a per-partition bounded merge (map-side partials,
  * O(k) state), the shape that scales to millions of candidates per
  * query where `row_number over (order by score)` must first sort the
  * whole group.
  *
  * Ties break toward the smaller id (matches the window-ranking
  * formulation; equivalence asserted in the spec).
  */
final case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // descending score, ascending id
  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def zero: List[ScoredId] = Nil

  def reduce(buf: List[ScoredId], v: ScoredId): List[ScoredId] = insert(buf, v)

  def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[ScoredId], v: ScoredId): List[ScoredId] = {
    val (head, tail) = buf.span(better(_, v))
    val merged = head ::: v :: tail
    if (merged.length > k) merged.take(k) else merged
  }

  def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
  def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
