package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming MinHash+LSH near-duplicate candidates — the banded-LSH
  * twin of the batch `ns_dedup_minhash` candidate stage
  * ([[graft.operators.Dedup.minhashPairs]]), for a continuously
  * ingested document stream.
  *
  * Shape: the signature/band computation is the batch COLUMN
  * EXPRESSIONS verbatim ([[Dedup.minhashSigCol]] /
  * [[Dedup.bandHashArray]]: hashed 3-shingles → one-pass 64-MinHash →
  * 16 band keys; all map-only, no shuffle, event time rides along),
  * then ONE stateful operator keyed by `(band_idx, band_hash)`
  * replaces the batch band self-join: state is the bucket's member doc
  * ids, and each arriving doc emits a candidate pair against every
  * member already in its bucket. A pair sharing k bands is emitted k
  * times — the downstream exact verify deduplicates, exactly as the
  * batch plan's `.distinct()` does before its Jaccard join.
  *
  * State bounding — the 100 TB contract: one state entry per OCCUPIED
  * band bucket, members bounded by bucket occupancy within the dedup
  * horizon, and every bucket EXPIRES via EventTimeTimeout once the
  * watermark passes `maxSeenEventTime + horizon`. Event-time timers
  * (not processing-time): they advance with the data, so a drain run
  * (`Trigger.AvailableNow`) still reaches quiescence — processing-time
  * timers would re-schedule batches forever (the IncubationStream r6
  * fix) — and an idle stream holds its buckets until real data moves
  * the watermark, which is the semantics a dedup horizon wants.
  */
object StreamingNearDup {

  final case class BandObs(doc_id: Long, band_idx: Int, band_hash: Long,
      ingest_ts: Timestamp)
  final case class Candidate(doc_a: Long, doc_b: Long)
  final case class BucketState(members: Seq[Long], memberTs: Seq[Long], maxTsMs: Long)

  /** The typed (doc, band, event-time) stream — batch signature/band
    * expressions applied map-side, watermark NOT yet attached. */
  private[streaming] def bandObs(docs: DataFrame, tsCol: String): Dataset[BandObs] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), Dedup.hashedShingles(col("text"), 3).as("sh"),
        col(tsCol).as("ingest_ts"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), Dedup.minhashSigCol(col("sh")).as("sig"), col("ingest_ts"))
      .select(col("doc_id"), col("ingest_ts"),
        posexplode(Dedup.bandHashArray(col("sig"))).as(Seq("band_idx", "band_hash")))
      .select(col("doc_id"), col("band_idx"), col("band_hash"), col("ingest_ts"))
      .as[BandObs]
  }

  /** Near-dup candidate pairs over a watermarked document stream
    * (`doc_id`, `text`, event-time `tsCol`). `horizonMs` is the dedup
    * look-back: two docs are candidates only if they share a band
    * within it. */
  def candidates(docs: DataFrame, tsCol: String = "ingest_ts",
                 delay: String = "1 hour",
                 horizonMs: Long = 3600L * 1000L): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    bandObs(docs, tsCol)
      .withWatermark("ingest_ts", delay)
      .groupByKey(o => (o.band_idx, o.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fn(horizonMs))
  }

  private def fn(horizonMs: Long)(key: (Int, Long), it: Iterator[BandObs],
      state: GroupState[BucketState]): Iterator[Candidate] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // deterministic processing order inside a batch (bucket members
      // arrive unordered from the shuffle)
      val obs = it.toSeq.sortBy(o => (o.ingest_ts.getTime, o.doc_id))
      val st0 = state.getOption.getOrElse(BucketState(Nil, Nil, Long.MinValue))
      var members = st0.members.zip(st0.memberTs).toMap
      val out = ArrayBuffer.empty[Candidate]
      obs.foreach { o =>
        val ts = o.ingest_ts.getTime
        if (!members.contains(o.doc_id)) {
          // PER-PAIR horizon (r10 review: a continuously-warm bucket
          // never hit the whole-bucket timeout, so members never aged
          // out — pairs spanning far more than the horizon were
          // emitted and state grew without bound on a drip-fed key).
          // The contract is |t_a − t_b| ≤ horizon, enforced per pair.
          members.foreach { case (m, mts) =>
            if (math.abs(mts - ts) <= horizonMs)
              out += Candidate(math.min(m, o.doc_id), math.max(m, o.doc_id))
          }
          members += o.doc_id -> ts
        }
      }
      // per-member expiry: the watermark bounds how late data can be,
      // so a member older than (wm − horizon) can never pair again —
      // state is horizon-bounded even when the bucket stays warm
      val wm = state.getCurrentWatermarkMs()
      members = members.filter { case (_, ts) => ts >= wm - horizonMs }
      if (members.isEmpty) { state.remove(); out.iterator }
      else {
        val kept = members.toSeq.sortBy(_._1)
        val maxTs = math.max(st0.maxTsMs, obs.map(_.ingest_ts.getTime).max)
        state.update(BucketState(kept.map(_._1), kept.map(_._2), maxTs))
        // expire the bucket once the watermark passes maxSeen + horizon;
        // late-data guard: the timeout must sit beyond the current
        // watermark or Spark rejects it
        state.setTimeoutTimestamp(math.max(maxTs + horizonMs, wm + 1))
        out.iterator
      }
    }
  }
}
