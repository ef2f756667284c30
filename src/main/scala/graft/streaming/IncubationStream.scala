package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{LifecycleEvent, PipelineTrigger, Submission}
import graft.orchestration.StateMachine
import graft.orchestration.StateMachine._

/** Structured Streaming wrap of the incubation state machine (SURVEY §7
  * v3): the reference's SQS poll loop + culler background loop
  * (`mq_poller.py:16-30`, `job_culler.py:17-44`) become one keyed
  * stateful operator.
  *
  * `events → [stream-static join vs edges] → groupByKey(pipeline) →
  * flatMapGroupsWithState(StateMachine) → submissions`
  *
  * The state transitions are EXACTLY [[StateMachine]] — the same code
  * the batch dispatcher cogroups with — so streaming replay equivalence
  * (SURVEY §5.3) holds by construction; the replay test asserts it.
  *
  * Clocking: `fixedNow` pins the clock for deterministic replay tests
  * (wall-clock in production) and a ProcessingTimeTimeout re-culls idle
  * keys, implementing the reference's culling interval without a
  * driver-side loop.
  */
object IncubationStream {

  final case class KeyedDepSat(pipeline_uuid: String, dep: String, exec_uuid: String,
      event_id: Long, event_time: Timestamp)

  /** Route a lifecycle-event stream into dep-satisfied notifications for
    * 'all'-triggered children (stream-static broadcast join vs edges;
    * the run-now branches are handled by the batch dispatcher path). */
  def depSatisfactions(events: Dataset[LifecycleEvent],
                       edges: Dataset[PipelineTrigger],
                       metas: Map[String, Meta]): Dataset[KeyedDepSat] = {
    import events.sparkSession.implicits._
    val incubatingChildren = metas.filter { case (_, m) => !runnableNow(m) }.keySet
    val edgeView = broadcast(edges.toDF("child", "trigger_uuid", "op")
      .where(col("child").isin(incubatingChildren.toSeq: _*)))
    // !disable_downstream: a suppressed success must not satisfy deps
    // either — the batch dispatcher's depSats derive from its filtered
    // success branch, and the streaming side diverged (r7 review)
    events.where(col("event_subtype") === "success" && !col("disable_downstream")).toDF()
      .join(edgeView, col("pipeline_uuid") === edgeView("trigger_uuid"))
      .select(col("child").as("pipeline_uuid"), col("trigger_uuid").as("dep"),
        col("exec_uuid"), col("event_id"), col("event_time"))
      .as[KeyedDepSat]
  }

  /** The stateful operator. Emits released [[Submission]]s.
    *
    * `cullIntervalMs > 0` (production, continuous triggers): each
    * stateful key re-arms a ProcessingTimeTimeout so IDLE keys are
    * re-culled on the interval without new events — the reference's
    * culler loop as engine timers. `cullIntervalMs = 0` (drain /
    * replay runs, `Trigger.AvailableNow`): timers OFF — a
    * processing-time-timeout operator makes `shouldRunAnotherBatch`
    * true on every batch, so an AvailableNow query over it NEVER
    * reaches quiescence (it drains the source, then schedules empty
    * timer batches forever; the armed timers re-arm themselves and the
    * query outlives any await). Culling still happens on every event
    * arrival for the key, which is the only clock a finite drain can
    * advance anyway. [[GraftStream.startFromRaw]] picks the mode from
    * its trigger. */
  def submissions(depSats: Dataset[KeyedDepSat],
                  metas: Map[String, Meta],
                  fixedNow: Option[Timestamp] = None, // None = wall clock
                  debounceSeconds: Long = 300L,
                  ageOutSeconds: Long = 86400L,
                  cullIntervalMs: Long = 10000L): Dataset[Submission] = {
    import depSats.sparkSession.implicits._
    val bMetas = depSats.sparkSession.sparkContext.broadcast(metas)
    val timers = cullIntervalMs > 0

    def fn(key: String, it: Iterator[KeyedDepSat],
           state: GroupState[PipelineState]): Iterator[Submission] = {
      val meta = bMetas.value.getOrElse(key, Meta(None, Nil, 0, concurrency = false))
      val st0 = state.getOption.getOrElse(StateMachine.emptyState)
      val evs = it.map(d => DepSatisfied(d.dep, d.exec_uuid, d.event_id, d.event_time)).toSeq
      // the BATCH's processing time, not the wall clock (r10 review):
      // Spark pins getCurrentProcessingTimeMs to the micro-batch's
      // timestamp (persisted in the offset log), so task retries,
      // speculative attempts and a re-run of a failed batch all see
      // the SAME clock — System.currentTimeMillis here made the
      // emitted exec_uuid (which embeds the time) differ between
      // attempts, double-submitting a release under two ids that no
      // downstream dedup could reconcile, and could flip debounce/
      // age-out verdicts between attempts.
      val nowTs = fixedNow.getOrElse(new Timestamp(state.getCurrentProcessingTimeMs()))
      val (st1, releases, _) = stepKey(st0, meta, evs, nowTs, debounceSeconds, ageOutSeconds, key)
      if (st1.rows.isEmpty) state.remove()
      else {
        state.update(st1)
        // Spark clears the timeout on EVERY invocation (including
        // timeout-driven ones), so re-arm unconditionally — otherwise a
        // key whose timeout fired once but still holds rows is never
        // culled again until a new event arrives (ADVICE r1).
        if (timers) state.setTimeoutDuration(cullIntervalMs)
      }
      releases.iterator.map { r =>
        // stable id from the released row's identity + release time —
        // never a per-invocation counter (collides across batches)
        Submission(key, s"exec-$key-rel-${r.objId}-${nowTs.getTime}", r.sources, r.retryCount)
      }
    }

    depSats.groupByKey(_.pipeline_uuid)
      .flatMapGroupsWithState(OutputMode.Append,
        if (timers) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout)(fn)
  }

  /** Batch ("replay") evaluation of the same pipeline: used by the
    * equivalence test — run the event log through the identical
    * routing + state machine with a fixed clock, no streaming engine. */
  def replayBatch(events: Dataset[LifecycleEvent],
                  edges: Dataset[PipelineTrigger],
                  metas: Map[String, Meta],
                  now: Timestamp,
                  debounceSeconds: Long = 300L,
                  ageOutSeconds: Long = 86400L): Dataset[Submission] = {
    import events.sparkSession.implicits._
    val bMetas = events.sparkSession.sparkContext.broadcast(metas)
    depSatisfactions(events, edges, metas)
      .groupByKey(_.pipeline_uuid)
      .flatMapGroups { (key, it) =>
        val meta = bMetas.value.getOrElse(key, Meta(None, Nil, 0, concurrency = false))
        val evs = it.map(d => DepSatisfied(d.dep, d.exec_uuid, d.event_id, d.event_time)).toSeq
        val (_, releases, _) = stepKey(StateMachine.emptyState, meta, evs, now, debounceSeconds, ageOutSeconds, key)
        releases.iterator.map { r =>
          Submission(key, s"exec-$key-rel-${r.objId}-${now.getTime}", r.sources, r.retryCount)
        }
      }
  }
}
