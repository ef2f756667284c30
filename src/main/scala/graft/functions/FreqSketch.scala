package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch: bounded-memory approximate token
  * frequencies in ONE pass, with map-side partials.
  *
  * Why not plain `explode + groupBy(token)`? That shuffles one row per
  * token occurrence and keys the exchange by token — at 100 TB the
  * token domain is the corpus vocabulary and the hot tokens are
  * maximally skewed (Zipf), so the top reducer receives the count of
  * "the". The sketch keeps at most `capacity` counters per partition
  * and merges sketches, so only `capacity`-sized states cross the wire
  * (classic Misra–Gries, with the mergeable-summaries combine step of
  * Agarwal et al., PODS'12).
  *
  * Guarantees (standard MG):
  *  - estimated count ≤ true count ≤ estimated + `decrements`;
  *  - `decrements` ≤ N / (capacity + 1) (N = total token count), so
  *    every token with true count > N/(capacity+1) is present;
  *  - when `decrements == 0` (no counter ever evicted — e.g. vocabulary
  *    fits in capacity) every estimate is EXACT, which is what lets the
  *    registered query hash-match an exact SQL oracle while running the
  *    genuine sketch path.
  */
final case class FreqSketch(counts: Map[String, Long], decrements: Long)

class MisraGriesAggregator(capacity: Int)
    extends Aggregator[Seq[String], FreqSketch, FreqSketch] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  def zero: FreqSketch = FreqSketch(Map.empty, 0L)

  /** One document's tokens: count locally (docs are small), then a
    * single capacity-trimmed merge. */
  def reduce(buf: FreqSketch, tokens: Seq[String]): FreqSketch = {
    val local = tokens.groupBy(identity).map { case (t, occ) => t -> occ.size.toLong }
    merge(buf, FreqSketch(local, 0L))
  }

  /** Mergeable-summaries combine: sum counters; if over capacity,
    * subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive — the estimation error grows by exactly that
    * subtrahend, accumulated in `decrements`. */
  def merge(a: FreqSketch, b: FreqSketch): FreqSketch = {
    val summed = (a.counts.keySet ++ b.counts.keySet).iterator
      .map(t => t -> (a.counts.getOrElse(t, 0L) + b.counts.getOrElse(t, 0L)))
      .toMap
    if (summed.size <= capacity) FreqSketch(summed, a.decrements + b.decrements)
    else {
      val d = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val kept = summed.collect { case (t, c) if c > d => t -> (c - d) }
      FreqSketch(kept, a.decrements + b.decrements + d)
    }
  }

  def finish(buf: FreqSketch): FreqSketch = buf

  def bufferEncoder: Encoder[FreqSketch] = ExpressionEncoder[FreqSketch]()
  def outputEncoder: Encoder[FreqSketch] = ExpressionEncoder[FreqSketch]()
}
