package graft.model

import java.sql.Timestamp

/** Typed schema layer for the rebuilt engine's metadata plane.
  *
  * Mirrors the reference's pydantic models
  * (`/root/reference/src/kalytical/models/pipeline_models.py:22-47`,
  * `runtime_models.py:5-65`) as Scala case classes with
  * `Encoders.product` — Spark `Dataset[T]` replaces MongoDB documents.
  * Free-form dicts (`engine_args`, `pipeline_body`) become JSON string
  * columns parsed on demand (`from_json`/`get_json_object`); the
  * `tags` map is flattened to the two keys the fixtures exercise, with
  * the general `MapType` form available via [[graft.orchestration.Catalog]].
  */

/** One pipeline definition = one node of the pipeline DAG.
  * Reference: `PipelineHeaderModel`/`PipelineModel`
  * (`pipeline_models.py:22-47`).
  */
final case class PipelineDef(
    pipeline_uuid: String,        // PK, matches ^[a-z0-9-]+$ (pipeline_models.py:36-41)
    description: String,
    retry_max: Int,               // default 0 (pipeline_models.py:26)
    concurrency: Boolean,         // may 2 instances run at once (pipeline_models.py:25-27)
    engine: String,               // engine name; rebuild value "spark-local"
    engine_args: String,          // JSON (engine.py:110-148 keys)
    schedule: Option[String],     // cron expr -> scheduled trigger (ext_sched.py:21)
    triggers_op: Option[String],  // 'all' | 'any' | null (pipeline_models.py:15-19)
    scheduler_tracking_id: Option[String],
    tags_team: Option[String],
    tags_env: Option[String],
    pipeline_body: Option[String] // opaque JSON payload (pipeline_models.py:47)
)

/** Normalized DAG edge: `child` runs after `parent` per `op` rule.
  * Reference: embedded `TriggersOnModel.pipeline_uuids` array
  * (`pipeline_models.py:11-19`), exploded here so all dependency
  * resolution becomes equi-joins.
  */
final case class PipelineTrigger(
    pipeline_uuid: String, // child
    trigger_uuid: String,  // parent it triggers on
    op: String             // 'all' | 'any'
)

/** Job lifecycle event — the stream driving everything.
  * Reference: `LifecycleEventModel`/`JobLifecycleEventBody`
  * (`runtime_models.py:5-32`).
  */
final case class LifecycleEvent(
    event_id: Long,
    event_type: String,     // 'job_exec_update' (runtime_models.py:29)
    event_subtype: String,  // success|failure|running|origination|submitted
    pipeline_uuid: String,
    exec_uuid: String,
    event_time: Timestamp,
    received_time: Timestamp, // ingest stamp (data_provider.py:130)
    retry_count: Int,
    disable_downstream: Boolean
)

/** Live run state projection.
  * Reference: `RunningPipelineModel` (`runtime_models.py:35-49`);
  * engine status vocabulary `runtime_models.py:46` + the raw phases that
  * leak through at `facade.py:88`/`engine.py:189`.
  */
final case class RunningJob(
    exec_uuid: String,
    pipeline_uuid: String,
    engine: String,
    engine_tracking_id: String,
    engine_status: String, // success|running|failed|aborted|timed_out|waiting|pending
    start_time: Option[Timestamp],
    end_time: Option[Timestamp]
)

/** Deferred ("incubating") run.
  * Reference: `IncubatingPipelineModel` (`runtime_models.py:52-65`).
  */
final case class Incubating(
    obj_id: String,        // PK (Mongo _id analog, data_provider.py:235)
    pipeline_uuid: String,
    create_time: Timestamp,
    created_by_uuid: Option[String],
    reason: String,        // 'concurrency' | 'dependencies' (runtime_models.py:62)
    retry_count: Int
)

/** Flattened waiting-set entry: `{trigger_uuid: 'waiting' | exec_uuid}`
  * (`data_provider.py:210-224`).
  */
final case class IncubatingTrigger(
    obj_id: String,
    trigger_uuid: String,
    status: String // 'waiting' or the satisfying exec_uuid
)

/** A submission emitted by the dispatcher: run `pipeline_uuid` now.
  * Reference: `queue_pipeline` (`dispatcher.py:70-86`).
  */
final case class Submission(
    pipeline_uuid: String,
    exec_uuid: String,
    source_uuids: Map[String, String], // {trigger_uuid -> exec_uuid}
    retry_count: Int
)
