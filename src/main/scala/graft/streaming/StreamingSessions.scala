package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SESSIONIZATION — the stateful twin of the batch
  * `Analytics2.sessions` (`ns_sessions`), built on the same native
  * `session_window` operator so the two forms share one session state
  * machine: gap-merged event-time windows per user, closed when the
  * watermark passes session_end + gap.
  *
  * Scale/state shape: one keyed shuffle on (session_window, user_id);
  * state is O(open sessions) = O(active users), bounded by the
  * watermark horizon — a user idle past the gap has their session
  * CLOSED and emitted exactly once (append mode), after which the
  * state row is dropped. This is the streaming mirror of the batch
  * plan's "shuffle once on user_id, merge windows within each key —
  * no self-join, no window-function double sort".
  *
  * Emits the batch query's exact schema (user_id, session_start,
  * session_end, n_events) so the replay spec can compare the emitted
  * set row-for-row against `ns_sessions` on the same input — sharp
  * set equality, not counts (StreamingSpec drives the watermark past
  * the last real event with a sentinel row so every real session
  * closes).
  */
object StreamingSessions {

  /** `events`: a streaming frame with `user_id` and event-time `ts`.
    * Watermark is applied here so callers can't forget it; late rows
    * beyond `watermarkDelay` are dropped rather than reopening an
    * emitted session (exactly-once emission per session). */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
}
