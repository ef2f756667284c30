package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch: bounded-memory approximate token
  * frequencies in ONE pass, with map-side partials.
  *
  * Why not plain `explode + groupBy(token)`? That plan's partial-agg
  * hash state and its shuffle grow with the VOCABULARY (urls, ids,
  * rare tokens — easily billions of keys at 100 TB), and the exchange
  * keys by token under maximal Zipf skew. The sketch caps state at
  * O(capacity) per partition regardless of vocabulary, and only
  * sketch-sized summaries cross the wire (classic Misra–Gries with the
  * mergeable-summaries combine of Agarwal et al., PODS'12). The trade
  * is per-row CPU (typed path, no codegen) — measured honestly in
  * BASELINE.md: on a small-vocab corpus the codegen'd groupBy wins
  * wall-clock; the sketch is the path that survives unbounded key
  * domains.
  *
  * Amortization: counters accumulate with 2× slack and are trimmed to
  * `capacity` survivors only on overflow (and once in `finish`), so a
  * trim's O(slack·log) sort amortizes over the ≥`capacity` fresh keys
  * that triggered it — NOT per row (the naive per-row trim measured
  * 20× slower than it needed to be).
  *
  * Guarantees (standard MG, unchanged by slack — every trim subtracts
  * its `d` from ≥ capacity+1 counters, so Σd ≤ N/(capacity+1)):
  *  - estimated count ≤ true count ≤ estimated + `decrements`;
  *  - `decrements` ≤ N / (capacity + 1) (N = total token count), so
  *    every token with true count > N/(capacity+1) survives;
  *  - when `decrements == 0` (vocabulary fit — no trim ever fired)
  *    every estimate is EXACT, which is what lets the registered query
  *    hash-match an exact SQL oracle while running the genuine sketch
  *    path.
  */
final case class FreqSketch(counts: Map[String, Long], decrements: Long)

class MisraGriesAggregator(capacity: Int)
    extends Aggregator[Seq[String], FreqSketch, FreqSketch] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  def zero: FreqSketch = FreqSketch(Map.empty, 0L)

  /** Subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive — the estimation error grows by exactly that
    * subtrahend, accumulated in `decrements`. No-op under `atMost`. */
  private def trim(counts: Map[String, Long], dec: Long, atMost: Int): FreqSketch =
    if (counts.size <= atMost) FreqSketch(counts, dec)
    else {
      val d = counts.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      FreqSketch(counts.collect { case (t, c) if c > d => t -> (c - d) }, dec + d)
    }

  /** One document's tokens: plain counter bumps; trim only on slack
    * overflow. */
  def reduce(buf: FreqSketch, tokens: Seq[String]): FreqSketch = {
    var counts = buf.counts
    tokens.foreach(t => counts = counts.updated(t, counts.getOrElse(t, 0L) + 1L))
    trim(counts, buf.decrements, atMost = capacity * 2)
  }

  /** Mergeable-summaries combine: sum counters, trim on overflow. */
  def merge(a: FreqSketch, b: FreqSketch): FreqSketch = {
    val (small, large) = if (a.counts.size < b.counts.size) (a, b) else (b, a)
    var counts = large.counts
    small.counts.foreach { case (t, c) =>
      counts = counts.updated(t, counts.getOrElse(t, 0L) + c)
    }
    trim(counts, a.decrements + b.decrements, atMost = capacity * 2)
  }

  /** Final contraction to the promised ≤ `capacity` counters. */
  def finish(buf: FreqSketch): FreqSketch =
    trim(buf.counts, buf.decrements, atMost = capacity)

  def bufferEncoder: Encoder[FreqSketch] = ExpressionEncoder[FreqSketch]()
  def outputEncoder: Encoder[FreqSketch] = ExpressionEncoder[FreqSketch]()
}
