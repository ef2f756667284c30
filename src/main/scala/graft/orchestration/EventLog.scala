package graft.orchestration

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LifecycleEvent

/** Append-only event history: the reference's `event_history`
  * collection (D9–D11, `/root/reference/src/kalytical/core/
  * data_provider.py:128-155`).
  *
  * Batch form appends partitioned parquet (partitioned by event date so
  * the D10 time-range scan prunes partitions at scale); the streaming
  * form is the history sink in [[graft.streaming.IncubationStream]].
  */
object EventLog {

  /** D9 — append with ingest timestamp. `received_time` is stamped at
    * the sink (`data_provider.py:130`); for deterministic tests pass
    * `now`, production uses `current_timestamp()`. */
  def stamp(events: DataFrame, now: Option[Timestamp] = None): DataFrame =
    events.withColumn("received_time",
      now.map(lit(_)).getOrElse(current_timestamp()))

  def append(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("received_time")))
      .write.mode("append").partitionBy("event_date").parquet(path)

  /** D10 — history query: time-range + optional equality filters +
    * sort-desc + limit. All filters and the date-partition prune push
    * into the scan; the sort+limit plans as TakeOrderedAndProject. */
  def history(events: Dataset[LifecycleEvent],
              now: Timestamp,
              sinceSeconds: Long = 1000L,
              pipelineUuid: Option[String] = None,
              execUuid: Option[String] = None,
              eventType: Option[String] = None,
              eventSubtype: Option[String] = None,
              maxRecords: Int = 20): DataFrame = {
    val cutoff = new Timestamp(now.getTime - sinceSeconds * 1000L)
    var q = events.toDF().where(col("received_time") >= lit(cutoff))
    pipelineUuid.foreach(v => q = q.where(col("pipeline_uuid") === v))
    execUuid.foreach(v => q = q.where(col("exec_uuid") === v))
    eventType.foreach(v => q = q.where(col("event_type") === v))
    eventSubtype.foreach(v => q = q.where(col("event_subtype") === v))
    q.orderBy(col("received_time").desc, col("event_id").desc).limit(maxRecords)
  }

  /** D11 — truncate. */
  def flush(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
  }
}
