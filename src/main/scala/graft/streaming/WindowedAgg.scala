package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.dround

/** Event-time windowed aggregation with watermarking — the streaming
  * form of K22 (`k22_events_daily` is its batch-checkable analog;
  * SURVEY §2.b streaming row). Batch replay of the same fold over the
  * same input must equal the batch query — asserted in
  * WindowedAggSpec.
  *
  * Scale: tumbling-window group-agg is a keyed shuffle on
  * (window, event_type) with partial aggregation map-side; the
  * watermark bounds state to (max event time − delay), so state size
  * is O(active windows × types), independent of stream length.
  */
object WindowedAgg {

  /** Tumbling daily counts/sums per event_type over an event-time
    * stream with `ts` and `value` columns. Late data beyond
    * `watermarkDelay` is dropped (completed windows emit exactly once
    * in append mode). */
  def dailyTotals(events: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dround(sum("value"), 2).as("total_value"))
      .select(col("event_type"), to_date(col("w.start")).as("day"),
        col("n"), col("total_value"))
}
