package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.GraftQuery.checked
import graft.functions.dround
import graft.sources.Tables

/** Event-stream analytics beyond plain tumbling aggregation (K22) and
  * sessionization (`ns_sessions`): a bounded-window RANGE JOIN
  * (conversion attribution) and per-type daily ANOMALY detection —
  * the monitoring surface a pipeline orchestrator wants over its own
  * event log as much as over user events.
  */
object EventOps {

  /** Conversion ATTRIBUTION via range join: for every purchase, how
    * many same-user touch events (and clicks specifically) landed in
    * the preceding hour. The classic bounded-interval join: equi-key
    * (user_id) + a range predicate on event time.
    *
    * Scale design — the equi-key carries the shuffle: Spark plans a
    * sort-merge join on `user_id` with the time predicates evaluated
    * inside each merged key group, so the pair space is bounded per
    * user, never corpus × corpus. At 100 TB both sides are bucketed by
    * user and sorted by ts (the layout `ScaleOps.bucketedWrite`
    * demonstrates), making this a zero-shuffle per-bucket merge scan;
    * whale users split via AQE skew handling. The 1-hour bound is what
    * keeps per-key state finite — the same bound the streaming as-of
    * twin ([[graft.streaming.StreamingAsof]]) turns into a watermark.
    *
    * LEFT join so zero-touch purchases stay in the output (count of a
    * nullable column counts matches only). Timestamps compare at
    * microsecond precision on both engines (`Tables.events` truncates;
    * the oracle CASTs ns → µs TIMESTAMP, as `ns_sessions` does).
    */
  val attribution: GraftQuery = checked("ns_events_attribution",
    """SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(t.ts) AS n_touches,
           COUNT(CASE WHEN t.event_type = 'click' THEN 1 END) AS n_clicks
    FROM events p LEFT JOIN events t
      ON t.user_id = p.user_id AND t.event_type <> 'purchase'
      AND CAST(t.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
      AND CAST(t.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)
    WHERE p.event_type = 'purchase'
    GROUP BY purchase_id, p.user_id
    ORDER BY purchase_id""") { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val touches = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"), col("event_type"))
    purchases
      .join(touches,
        col("t_user") === col("user_id") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("t_ts") < col("p_ts"),
        "left")
      .groupBy("purchase_id", "user_id")
      .agg(count(col("t_ts")).as("n_touches"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"))
      .orderBy("purchase_id")
  }

  /** Per-type daily volume ANOMALIES: z-score of each day's event count
    * against that type's full-range mean/stddev, flagging |z| ≥ 2.
    *
    * Determinism contract (the k-means playbook): daily counts are
    * integers, so Σn and Σn² are EXACT in 64-bit — both sides compute
    * variance from the same closed formula (Q − S²/c)/(c−1) over exact
    * sums instead of each engine's streaming variance kernel, whose
    * accumulation order varies. One narrow aggregate (type × ~30 days)
    * then a broadcast-sized join back — at 100 TB the only corpus-wide
    * pass is the groupBy(type, day) count, which partial-aggregates
    * map-side before the (tiny) shuffle.
    */
  val anomalies: GraftQuery = checked("ns_events_anomaly",
    """WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY event_type, day),
    stats AS (
      SELECT event_type, COUNT(*) AS c, SUM(n) AS s, SUM(n * n) AS q
      FROM daily GROUP BY event_type)
    SELECT d.event_type, d.day, d.n,
           ROUND((d.n - CAST(s AS DOUBLE) / c) /
                 sqrt((q - CAST(s AS DOUBLE) * s / c) / (c - 1)), 4) AS z,
           CAST(ABS((d.n - CAST(s AS DOUBLE) / c) /
                 sqrt((q - CAST(s AS DOUBLE) * s / c) / (c - 1))) >= 2.0 AS BOOLEAN) AS is_anomaly
    FROM daily d JOIN stats USING (event_type)
    ORDER BY event_type, day""") { (spark, dir) =>
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("c"), sum("n").as("s"), sum(col("n") * col("n")).as("q"))
    val z = (col("n") - col("s").cast("double") / col("c")) /
      sqrt((col("q") - col("s").cast("double") * col("s") / col("c")) / (col("c") - 1))
    daily.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        dround(z, 4).as("z"), (abs(z) >= 2.0).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  val all: Seq[GraftQuery] = Seq(attribution, anomalies)
}
