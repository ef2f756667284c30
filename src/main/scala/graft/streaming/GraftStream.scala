package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model._
import graft.orchestration.StateMachine.{runnableNow, Meta}

/** The whole reference system as ONE streaming driver program
  * (SURVEY §3 "Spark rebuild lifecycle"):
  *
  * {{{
  * events (json dir / any source)
  *   → EventIngest.parse (corrupt quarantine)
  *   → router: origination|failure|success   [stream-static joins vs defs/edges]
  *   → run-now candidates  ∪  IncubationStream releases ('all'-trigger state)
  *   → foreachBatch: concurrency gate vs live engine state → submissions sink
  *   + history sink (append, date-partitioned)
  * }}}
  *
  * The reference needed an API process, an SQS poller thread, a culler
  * loop thread, MongoDB and a distributed lock to do this; here it is
  * two streaming queries over one checkpoint. Restart-safe by
  * construction (checkpointed offsets + keyed state store).
  */
object GraftStream {

  final case class Sinks(submissions: StreamingQuery, history: StreamingQuery,
                         quarantine: Option[StreamingQuery] = None)

  /** Blocked-by-concurrency submissions persist here (under the
    * submissions sink, underscore-prefixed so parquet readers of the
    * sink skip it) instead of vanishing — the batch dispatcher DEFERS
    * such runs for the culler's debounced requeue (D13/S2); a pure
    * stream has no incubation re-entry, so the deferral is surfaced as
    * a durable record for an external requeue loop (r7 review). */
  def deferredDir(submissionsDir: String): String = s"$submissionsDir/_deferred"

  /** Route a typed event stream into run-now candidates (origination /
    * retry / 'any'-fan-out) — the stateless branches of the dispatcher,
    * all stream-static broadcast joins against the catalog. */
  def runNowCandidates(events: Dataset[LifecycleEvent],
                       defs: Dataset[PipelineDef],
                       edges: Dataset[PipelineTrigger],
                       metas: Map[String, Meta]): DataFrame = {
    val defKeys = broadcast(defs.select("pipeline_uuid"))

    val origination = events
      .where(col("event_subtype") === "origination")
      .join(defKeys, Seq("pipeline_uuid"), "left_semi")
      .select(col("pipeline_uuid"), col("event_id"), col("retry_count"),
        map().as("source_uuids"))

    val retries = events
      .where(col("event_subtype") === "failure")
      .join(broadcast(defs.select("pipeline_uuid", "retry_max")), Seq("pipeline_uuid"))
      .where(col("retry_count") < col("retry_max"))
      .select(col("pipeline_uuid"), col("event_id"),
        (col("retry_count") + 1).as("retry_count"), map().as("source_uuids"))

    val runNowChildren = metas.filter { case (_, m) => runnableNow(m) }.keySet
    val edgeView = broadcast(edges.toDF("child", "trigger_uuid", "op")
      .where(col("child").isin(runNowChildren.toSeq: _*)))
    val fanout = events
      .where(col("event_subtype") === "success" && !col("disable_downstream"))
      .join(edgeView, col("pipeline_uuid") === edgeView("trigger_uuid"))
      .select(col("child").as("pipeline_uuid"), col("event_id"), lit(0).as("retry_count"),
        map(col("trigger_uuid"), col("exec_uuid")).as("source_uuids"))

    origination.unionByName(retries).unionByName(fanout)
  }

  /** Start the full pipeline over a JSON-lines event directory.
    * `runningSnapshot` supplies the live run set per micro-batch for the
    * concurrency gate (P5/P6). Quarantine is ON here (under
    * `checkpointRoot/quarantined`) — r12 review: the primary entry
    * points passed `quarantineDir = None`, so the corrupt-message
    * quarantine EventIngest advertises never ran for them and a
    * malformed producer line vanished without trace; callers needing a
    * custom location use [[startFromRaw]]. */
  def start(spark: SparkSession,
            eventsJsonDir: String,
            defs: Dataset[PipelineDef],
            edges: Dataset[PipelineTrigger],
            metas: Map[String, Meta],
            submissionsDir: String,
            historyDir: String,
            checkpointRoot: String,
            runningSnapshot: () => Dataset[RunningJob],
            fixedNow: Option[Timestamp],
            trigger: Trigger): Sinks =
    startFromRaw(spark,
      EventIngest.rawJsonDir(spark, eventsJsonDir),
      defs, edges, metas, submissionsDir, historyDir, checkpointRoot,
      runningSnapshot, fixedNow, trigger,
      quarantineDir = Some(s"$checkpointRoot/quarantined"))

  def start(spark: SparkSession, eventsJsonDir: String, defs: Dataset[PipelineDef],
            edges: Dataset[PipelineTrigger], metas: Map[String, Meta],
            submissionsDir: String, historyDir: String, checkpointRoot: String,
            runningSnapshot: () => Dataset[RunningJob],
            fixedNow: Option[Timestamp] = None): Sinks =
    start(spark, eventsJsonDir, defs, edges, metas, submissionsDir, historyDir,
      checkpointRoot, runningSnapshot, fixedNow, Trigger.AvailableNow())

  /** Source-agnostic entry: any streaming DataFrame with a string
    * `value` column of JSON event payloads — the file/json source
    * above, or the Kafka-shaped [[graft.sources.mq.SpoolMQProvider]]
    * (`value` cast to string), or a real Kafka topic in production.
    * Proves S1 parity is not file-source-specific: GraftStreamSpec runs
    * the identical pipeline over both sources. */
  def startFromRaw(spark: SparkSession,
            raw: DataFrame,
            defs: Dataset[PipelineDef],
            edges: Dataset[PipelineTrigger],
            metas: Map[String, Meta],
            submissionsDir: String,
            historyDir: String,
            checkpointRoot: String,
            runningSnapshot: () => Dataset[RunningJob],
            fixedNow: Option[Timestamp] = None,
            trigger: Trigger = Trigger.AvailableNow(),
            quarantineDir: Option[String] = None): Sinks = {
    import spark.implicits._

    val parsed = EventIngest.parse(raw)

    // history sink: append everything (D9) under EventLog's OWN
    // contract — received_time sink-stamped (the reference stamps at
    // the data provider, data_provider.py:130) and event_date
    // partitioned, so batch-written and stream-written history share
    // one schema and D10's partition prune works on both (r7 review:
    // the old sink stamped a foreign received_ingest column and left
    // producer-null received_time rows invisible to history queries)
    val history = graft.orchestration.EventLog.stamp(parsed.events.toDF(), fixedNow)
      .withColumn("event_date", to_date(col("received_time")))
      .writeStream.format("parquet")
      .partitionBy("event_date")
      .option("path", historyDir)
      .option("checkpointLocation", s"$checkpointRoot/history")
      .outputMode("append").trigger(trigger).start()

    // corrupt-message quarantine (the _unmarshall_sqs except-log path):
    // without a sink the malformed line would vanish without trace
    val quarantine = quarantineDir.map { dir =>
      parsed.corrupt.select(col("_raw").as("value"))
        .writeStream.format("text")
        .option("path", dir)
        .option("checkpointLocation", s"$checkpointRoot/quarantine")
        .outputMode("append").trigger(trigger).start()
    }

    // run-now branches ∪ stateful 'all'-trigger releases
    val candNow = runNowCandidates(parsed.events, defs, edges, metas)
      .as[(String, Long, Int, Map[String, String])]
      .map { case (p, eid, rc, src) => Submission(p, s"exec-$p-$eid", src, rc) }
    val depSats = IncubationStream.depSatisfactions(parsed.events, edges, metas)
    // drain runs (AvailableNow) must reach quiescence: cull timers off —
    // a processing-time-timeout operator re-schedules batches forever
    // (see IncubationStream.submissions doc). Continuous triggers keep
    // the timer-driven culler.
    val cullMs = if (trigger == Trigger.AvailableNow()) 0L else 10000L
    val released = IncubationStream.submissions(depSats, metas, fixedNow,
      cullIntervalMs = cullMs)
    // catalog concurrency flags as a tiny broadcast frame: the old
    // map-literal element_at was a per-row LINEAR scan of all K defs
    // (the repo's measured literal-map gotcha, r10 review) where the
    // broadcast hash join — the shape the adjacent `running` join
    // already uses — probes in O(1)
    val concRows = metas.toSeq.map { case (k, m) => (k, m.concurrency) }

    val submissions = candNow.unionByName(released)
      .writeStream
      .option("checkpointLocation", s"$checkpointRoot/submissions")
      .outputMode("append").trigger(trigger)
      .foreachBatch { (batch: Dataset[Submission], batchId: Long) =>
        // concurrency gate against the live run set (P5/P6) — per
        // micro-batch, mirroring the reference's submit-time check
        val running = runningSnapshot()
          .where(col("engine_status").isin("running", "waiting", "pending"))
          .select("pipeline_uuid").distinct()
        // within-batch rank mirrors the batch dispatcher's sequential
        // semantics: of N same-batch submissions for a
        // concurrency=false pipeline, the first runs and the rest
        // defer (r7 review — the set-at-once gate passed all N)
        // (length, exec_uuid) ranks numeric suffixes numerically
        // (r10 review: plain string order put 'exec-p-100' before
        // 'exec-p-99', so the SECOND submission ran and the first
        // deferred — the batch dispatcher runs them in event order)
        val rankW = org.apache.spark.sql.expressions.Window
          .partitionBy("pipeline_uuid").orderBy(length(col("exec_uuid")), col("exec_uuid"))
        import batch.sparkSession.implicits._
        val concDf = concRows.toDF("pipeline_uuid", "_conc")
        val gated = batch.toDF()
          .join(broadcast(running.withColumn("_live", lit(true))), Seq("pipeline_uuid"), "left")
          .join(broadcast(concDf), Seq("pipeline_uuid"), "left")
          .withColumn("_rank", row_number().over(rankW))
          .withColumn("_pass",
            coalesce(col("_conc"), lit(false)) ||
              (col("_live").isNull && col("_rank") === 1))
          // PIN the verdicts before acting twice (r10 review #1): the
          // lineage embeds two nondeterministic inputs — the LIVE
          // runningSnapshot() and wall-clock-bearing release ids — so
          // re-evaluating it per action could write a submission to
          // NEITHER sink (run finished between the two actions) or to
          // both. persist() makes the three actions read one snapshot.
          .persist()
        try {
          gated.where(col("_pass")).drop("_live", "_conc", "_pass", "_rank")
            .write.mode("append").parquet(submissionsDir)
          // blocked runs are DEFERRED records, not silent drops — the
          // batch dispatcher's D13 analog (see deferredDir doc)
          val blocked = gated.where(!col("_pass")).drop("_live", "_conc", "_pass", "_rank")
          if (!blocked.isEmpty)
            blocked.write.mode("append").parquet(deferredDir(submissionsDir))
        } finally { gated.unpersist(); () }
        ()
      }.start()

    Sinks(submissions, history, quarantine)
  }
}
