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
    // make the advertised date-partition prune REAL (r12 review: the
    // filter above is on a DATA column, so an [[append]]-written log
    // listed and read every date partition regardless of the window).
    // The partition column only exists on files-backed frames read
    // from an append() layout — the facade's in-memory union has no
    // event_date, so the prune is applied exactly where it can be.
    if (q.columns.contains("event_date"))
      q = q.where(col("event_date") >= to_date(lit(cutoff)))
    pipelineUuid.foreach(v => q = q.where(col("pipeline_uuid") === v))
    execUuid.foreach(v => q = q.where(col("exec_uuid") === v))
    eventType.foreach(v => q = q.where(col("event_type") === v))
    eventSubtype.foreach(v => q = q.where(col("event_subtype") === v))
    q.orderBy(col("received_time").desc, col("event_id").desc).limit(maxRecords)
  }

  /** D11 — truncate. The filesystem comes from the PATH, not the
    * default FS (r12 review: `FileSystem.get(conf)` returned
    * fs.defaultFS, so an event log on any other scheme — s3a:// under
    * an hdfs:// default — made every truncate throw "Wrong FS"; this
    * was the one deviation from the repo-wide
    * `path.getFileSystem(conf)` convention). */
  def flush(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
