package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC dimension maintenance — the stateful twin of the
  * batch `EventCdc.cdcMerge` MERGE: one `flatMapGroupsWithState`
  * keyed by user whose entire state is the CURRENT dimension row
  * `(ts_us, event_id, state, cents, live, rev)`. Each arriving change
  * that supersedes the current row (later `(ts, event_id)` — the
  * batch plan's latest-wins order) emits a REVISION record:
  * an upsert with the new attributes, or a tombstone (`live=false`)
  * when the change is an 'error' event — so the downstream "latest
  * revision per key" view IS the maintained dimension at every
  * point in the stream, exactly how a warehouse consumes a CDC feed.
  * Out-of-order events BEHIND the current row are ignored (the
  * batch latest-wins semantics; a production feed would watermark
  * first, the fold is unchanged — the [[StreamingTransitions]]
  * contract).
  *
  * State is O(1) per key and revisions are append-only: the replay
  * spec folds the emitted revision stream to its final row per key
  * and checks it equals the batch merge over the same events with
  * the cutoff at zero (everything is a "change" against an empty
  * snapshot — the regime where the two formulations must agree
  * exactly).
  */
object StreamingCdc {

  final case class CdcEvent(user_id: Long, event_id: Long, ts: Timestamp,
                            event_type: String, cents: Long)
  /** `rev` lives IN the state so the counter survives micro-batch
    * boundaries — a per-invocation local would restart at 0 each batch
    * and two revisions with equal ts_us emitted in different batches
    * (possible: an equal-ts, higher-event_id change supersedes) would
    * be ambiguous to a downstream latest-revision fold. */
  final case class DimState(ts_us: Long, event_id: Long, state: String,
                            cents: Long, live: Boolean, rev: Long)
  /** Revisions are totally ordered per key by `rev` (monotonic across
    * batches, persisted in [[DimState]]); `(ts_us, event_id)` — the
    * batch plan's latest-wins key — is carried so a consumer can fold
    * by the same order the merge itself uses. */
  final case class Revision(user_id: Long, rev: Long, event_id: Long,
                            state: String, cents: Long, ts_us: Long, live: Boolean)

  private def us(t: Timestamp): Long = tsMicros(t) // shared precision contract

  def dimensionStream(events: Dataset[CdcEvent]): Dataset[Revision] = {
    implicit val stateEnc = Encoders.product[DimState]
    implicit val outEnc = Encoders.product[Revision]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[CdcEvent], state: GroupState[DimState]) =>
          var cur = state.getOption
          val out = Vector.newBuilder[Revision]
          it.toIndexedSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val supersedes = cur.forall(c =>
              us(e.ts) > c.ts_us || (us(e.ts) == c.ts_us && e.event_id > c.event_id))
            if (supersedes) {
              val live = e.event_type != "error"
              val rev = cur.map(_.rev).getOrElse(0L) + 1
              cur = Some(DimState(us(e.ts), e.event_id, e.event_type, e.cents, live, rev))
              out += Revision(user, rev, e.event_id, e.event_type, e.cents, us(e.ts), live)
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
