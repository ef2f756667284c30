package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming INTERVAL-OVERLAP join — the stateful twin of the batch
  * `EventOps.intervalJoin`, and the demonstration that its bin
  * bucketization is not just a batch optimization: Spark REJECTS a
  * stream-stream join with no equality predicate ("Stream-stream join
  * without equality predicate is not supported"), so the time-bin
  * equi-key that turns the batch theta-join into a partitionable hash
  * join is the very thing that makes the streaming form EXIST. With
  * the bin key plus event-time range conditions on two watermarked
  * columns, Spark bounds each side's join state to the watermark
  * horizon (the ±15-minute range span + allowed lateness) — state is
  * O(arrival-rate × horizon), never corpus-sized, the streaming mirror
  * of the batch plan's bounded bin fan-out.
  *
  * The hot (interval) side replicates into every 30-minute bin its
  * window touches (stateless `explode(sequence(...))` before the join
  * — ≤ 3 bins for a 30-minute span); the event (point) side lands in
  * exactly ONE bin, so each true pair matches in exactly one bin and
  * no emit-once predicate is needed (the batch form needs one only
  * because BOTH of its sides are intervals).
  *
  * Emits at pair granularity (`hot_id`, `event_id`): a per-window
  * count is one more watermarked aggregation downstream, but pairs are
  * what the replay spec compares set-equal against the batch theta
  * join, keeping the equivalence claim sharp (a count would also pass
  * on compensating double-emit/drop errors; the pair set cannot).
  */
object StreamingIntervalJoin {

  private val BinUs = 1800L * 1000000L // 30-minute bins ≥ the window span

  /** `events`: streaming `(event_id, ts)`; `hot`: streaming
    * `(hot_id, h_ts)` high-value purchase instants. Joins every event
    * into the ±15-minute window around each hot purchase (excluding
    * the purchase row itself). Both inputs must be `readStream`
    * sources; watermarks are applied here so callers can't forget
    * them. */
  def hotWindowPairs(events: DataFrame, hot: DataFrame): DataFrame = {
    val bin = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c).cast("double") / BinUs).cast("long")
    val ev = events.select(col("event_id"), col("ts"))
      .withWatermark("ts", "1 minute")
      .withColumn("bin", bin(col("ts")))
    val hw = hot.select(col("hot_id"), col("h_ts"))
      .withWatermark("h_ts", "1 minute")
      .withColumn("bin", explode(sequence(
        bin(col("h_ts") - expr("INTERVAL 15 MINUTES")),
        bin(col("h_ts") + expr("INTERVAL 15 MINUTES")))))
    ev.join(hw,
      ev("bin") === hw("bin") &&
        expr("""ts >= h_ts - INTERVAL 15 MINUTES AND
                ts <= h_ts + INTERVAL 15 MINUTES AND
                event_id <> hot_id"""))
      .select(col("hot_id"), col("event_id"))
  }
}
