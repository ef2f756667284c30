package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.{FreqSketch, MisraGriesAggregator}

/** Streaming HEAVY HITTERS — the stateful twin of the batch
  * Misra–Gries query (`TextOps.heavyHitters`), substantiating its
  * claim that frequent-token tracking needs only sketch-sized state on
  * an unbounded stream: tokens shard by hash into [[DefaultShards]]
  * groups, and each group's ENTIRE state is one capacity-bounded
  * [[FreqSketch]] — O(shards × capacity) across the cluster, however
  * long the stream runs.
  *
  * Each micro-batch folds its token slice into the shard's sketch with
  * the SAME `reduce` the batch aggregator runs per partition, and the
  * shard emits its updated sketch (update semantics: latest emission
  * per shard supersedes). The consumer merges the ≤ shards sketches
  * with the aggregator's own `merge` + `finish` — so stream-merged
  * counts inherit the batch sketch's error bound, and with
  * `decrements == 0` (vocabulary fits) they are EXACT and the replay
  * spec checks bit-equality against the batch top-N.
  *
  * Sharding by token hash means merge never double-counts a token
  * (each token lives in exactly one shard), unlike partition sketches
  * which may all hold the same hot token — the streaming layout is the
  * STRICTLY friendlier one for the error bound.
  */
object StreamingHeavyHitters {

  val DefaultShards = 8

  final case class ShardSketch(shard: Int, counts: Map[String, Long], decrements: Long)

  /** One sketch-valued state per token shard; emits the shard's updated
    * sketch every micro-batch (use with OutputMode.Update). */
  def sketchStream(tokens: Dataset[String], nShards: Int = DefaultShards,
                   capacity: Int = 4096): Dataset[ShardSketch] = {
    val mg = new MisraGriesAggregator(capacity)
    implicit val stateEnc = Encoders.product[FreqSketch]
    implicit val outEnc = Encoders.product[ShardSketch]
    tokens
      .groupByKey(t => math.floorMod(t.hashCode, nShards))(Encoders.scalaInt)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[String], state: org.apache.spark.sql.streaming.GroupState[FreqSketch]) =>
          // fold in capacity-sized chunks (r10 review: it.toSeq
          // materialized the whole shard slice and reduce built a map
          // of ALL its distinct tokens before one trim — unbounded
          // transient memory in the operator whose point is the
          // sketch's 2·capacity bound)
          val next = it.grouped(capacity)
            .foldLeft(state.getOption.getOrElse(mg.zero))((b, chunk) => mg.reduce(b, chunk))
          state.update(next)
          ShardSketch(shard, next.counts, next.decrements)
      }
  }

  /** Merge the latest per-shard sketches back into one final sketch —
    * the consumer-side closing step (driver-sized: ≤ shards ×
    * capacity counters). */
  def mergeShards(sketches: Seq[ShardSketch], capacity: Int = 4096): FreqSketch = {
    val mg = new MisraGriesAggregator(capacity)
    mg.finish(sketches.map(s => FreqSketch(s.counts, s.decrements))
      .foldLeft(mg.zero)(mg.merge))
  }
}
