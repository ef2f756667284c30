package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

import graft.GraftConfig
import graft.functions.Retry
import graft.model._
import graft.orchestration._
import graft.orchestration.Dispatcher.IncubRow

/** Storage backend selection — the reference's `provider_factory`
  * (D19, `data_provider.py:291-295`): a trait + factory keyed by the
  * config's provider string. The parquet store is the only shipped
  * implementation (replacing MongoDB); a Delta/JDBC store would
  * implement the same trait.
  */
trait MetaStore {
  def loadDefs(spark: SparkSession): Dataset[PipelineDef]
  def loadEdges(spark: SparkSession): Dataset[PipelineTrigger]
  def saveDefs(defs: Dataset[PipelineDef]): Unit
  def saveEdges(edges: Dataset[PipelineTrigger]): Unit
}

final class ParquetMetaStore(cfg: GraftConfig) extends MetaStore {
  // FIRST BOOT (r12 review): a fresh GRAFT_META_DIR has no parquet yet,
  // and an unconditional read crashed startup with PATH_NOT_FOUND
  // before the HTTP surface could bind — a chicken-and-egg, since the
  // files are only created by the catalogHook an HTTP upsert drives.
  // A missing path is an EMPTY catalog (the bootstrap state), while a
  // present-but-unreadable path still fails loudly via spark.read.
  private def readOrEmpty[T](spark: SparkSession, path: String,
                             enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(path).as[T](enc)
    else spark.emptyDataset[T](enc)
  }
  def loadDefs(spark: SparkSession): Dataset[PipelineDef] =
    readOrEmpty(spark, cfg.catalogPath, Encoders.product[PipelineDef])
  def loadEdges(spark: SparkSession): Dataset[PipelineTrigger] =
    readOrEmpty(spark, cfg.edgesPath, Encoders.product[PipelineTrigger])
  def saveDefs(defs: Dataset[PipelineDef]): Unit =
    Retry(3)(defs.write.mode("overwrite").parquet(cfg.catalogPath))
  def saveEdges(edges: Dataset[PipelineTrigger]): Unit =
    Retry(3)(edges.write.mode("overwrite").parquet(cfg.edgesPath))
}

object MetaStore {
  def forConfig(cfg: GraftConfig): MetaStore = cfg.metaProvider match {
    case "parquet" => new ParquetMetaStore(cfg)
    case other => throw new IllegalArgumentException(s"unknown meta provider: $other")
  }
}

/** The engine's verb surface — the reference's 18 FastAPI endpoints
  * (`/root/reference/src/kalytical/facade.py:30-126`) as library
  * methods over the catalog, event log, engine manager and dispatcher.
  * Auth is out of scope for the engine core (SURVEY §2.a API surface);
  * a thin HTTP layer could wrap this 1:1.
  */
final class GraftApi(
    val spark: SparkSession,
    // @volatile (r12 review): mutations run under the facade's dispatch
    // lock but HTTP read routes read these WITHOUT it — a non-volatile
    // var gives the reader thread no happens-before edge with the
    // locked write, so it could observe arbitrarily stale catalog state
    @volatile var catalog: Catalog,
    @volatile var edges: Dataset[PipelineTrigger],
    val engines: EngineManager,
    cfg: GraftConfig = GraftConfig.default,
    val cronProvider: CronProvider = new RegistryCronProvider) {

  // --- pipeline CRUD (facade.py:30-68) ---------------------------------
  /** GET /pipeline/list (stub in the reference; semantics = D2). */
  def listPipelines(prefix: Option[String] = None, tagTeam: Option[String] = None,
                    tagEnv: Option[String] = None): DataFrame =
    catalog.list(prefix, tagTeam, tagEnv)

  /** GET /pipeline/describe */
  def describePipeline(uuid: String): Dataset[PipelineDef] = catalog.describe(uuid)

  /** GET /pipeline/head */
  def headPipeline(uuid: String): DataFrame = catalog.head(uuid)

  /** GET /pipeline_config/fetch_pipeline_body (D8, facade.py:65-68). */
  def fetchBody(uuid: String): DataFrame = catalog.body(uuid)

  /** GET /pipeline/downstream (D1) */
  def downstream(uuid: String): DataFrame = catalog.downstream(uuid, edges)

  /** PUT /pipeline (D5) — upsert def + its trigger edges, reconciling
    * the external schedule registration (`data_provider.py:69-70` +
    * `ext_sched.py:21-56`): a schedule registers/re-registers a cron
    * job and stamps its tracking id; removing the schedule deregisters
    * the previous registration. */
  def upsertPipeline(d: PipelineDef, triggers: Seq[PipelineTrigger]): Unit = {
    // every trigger row must belong to THIS def: a stray row for
    // another pipeline would silently inject an edge onto it — and be
    // irremovable by re-upserting d, since the fold below only replaces
    // rows keyed on d.pipeline_uuid (r7 review)
    val strays = triggers.filter(_.pipeline_uuid != d.pipeline_uuid)
    require(strays.isEmpty,
      s"trigger rows must reference pipeline_uuid=${d.pipeline_uuid}; got ${strays.map(_.pipeline_uuid).distinct.mkString(",")}")
    val prev = catalog.describe(d.pipeline_uuid).collect().headOption // catalog metadata: bounded
    val reconciled = d.schedule match {
      case Some(sched) =>
        d.copy(scheduler_tracking_id =
          Some(cronProvider.createCronJob(sched, d.pipeline_uuid)))
      case None =>
        // deregistration of a removed schedule is deferred until the
        // catalog upsert succeeds: deleting first would leave the old
        // scheduled def in the catalog with its registration gone if the
        // upsert is rejected (silently-stops-firing hole)
        d.copy(scheduler_tracking_id = None)
    }
    try catalog = catalog.upsert(reconciled, triggers)
    catch {
      case e: Throwable =>
        // roll the registration back to the previous def's state so a
        // rejected upsert (D5 validation) leaves no stray cron job; the
        // schedule-removal path created nothing, so there is nothing to
        // undo there and prev's registration survives intact
        reconciled.scheduler_tracking_id.foreach { jobName =>
          prev.flatMap(p => p.schedule.map(s => (s, p))) match {
            case Some((s, p)) => cronProvider.createCronJob(s, p.pipeline_uuid)
            case None => cronProvider.deleteCronJob(jobName)
          }
        }
        throw e
    }
    if (reconciled.schedule.isEmpty)
      prev.flatMap(_.scheduler_tracking_id).foreach(cronProvider.deleteCronJob)
    val others = edges.where(org.apache.spark.sql.functions.col("pipeline_uuid") =!= d.pipeline_uuid)
    edges = others.unionByName(
      spark.createDataset(triggers)(Encoders.product[PipelineTrigger]))
  }

  /** DELETE /pipeline (D6) — also deregisters any external schedule. */
  def deletePipeline(uuid: String, safeDelete: Boolean = true): Unit = {
    val tracking = catalog.describe(uuid).collect().headOption.flatMap(_.scheduler_tracking_id)
    catalog = catalog.delete(uuid, edges, safeDelete)
    edges = edges.where(org.apache.spark.sql.functions.col("pipeline_uuid") =!= uuid)
    tracking.foreach(cronProvider.deleteCronJob)
  }

  /** DELETE /pipeline/flush (D7). Flush bypasses the D6 per-pipeline
    * orphan guard, so the flushed pipelines' trigger edges must go with
    * them — a surviving edge whose child has no def would surface as an
    * unknown-child warning on the next dispatch (ADVICE r1). External
    * schedules deregister too (r12 review: [[deletePipeline]] did, flush
    * did not — a flushed scheduled pipeline's CronJob kept firing
    * callbacks for a nonexistent pipeline forever, and the stale
    * registration was unreachable afterwards because the def carrying
    * its tracking id was gone). */
  def flushPipelines(prefix: String): Unit = {
    val doomedDefs = catalog.list(Some(prefix))
      .select("pipeline_uuid", "scheduler_tracking_id")
      .collect() // catalog-sized
    catalog = catalog.flush(prefix)
    val doomed = spark.createDataset(doomedDefs.map(_.getString(0)).toSeq)(Encoders.STRING)
      .toDF("pipeline_uuid")
    edges = edges.join(doomed, Seq("pipeline_uuid"), "left_anti")
      .as[PipelineTrigger](Encoders.product[PipelineTrigger])
    doomedDefs.foreach(r => Option(r.getString(1)).foreach(cronProvider.deleteCronJob))
  }

  // --- events & history (facade.py:100-116) ----------------------------
  /** POST /pipeline/dispatcher/event + the run_by_pipeline_uuid variant
    * (synthesizes an origination event, facade.py:72-78). One batch
    * step of the dispatcher; returns its outputs. */
  def dispatch(events: Seq[LifecycleEvent],
               running: Dataset[RunningJob],
               incubating: Dataset[IncubRow],
               now: Timestamp): Dispatcher.StepResult =
    Dispatcher.step(spark, catalog.defs, edges, running, incubating,
      spark.createDataset(events)(Encoders.product[LifecycleEvent]), now,
      cfg.concurrencyDebounceSeconds, cfg.incubatingJobAgeOutSeconds)

  /** The synthesized manual-run origination — one definition so the
    * HTTP facade can log the SAME event it dispatches (manual runs
    * used to bypass the history log, r7 review). */
  def manualOrigination(uuid: String, now: Timestamp): LifecycleEvent = {
    // negative id: engine-minted, the reserved half-space (see
    // Cron.tick's sub-range note; r10 review). Strictly-decreasing
    // per-process floor: two manual runs of DIFFERENT pipelines in the
    // same millisecond would otherwise alias in the durable event log —
    // the uniqueness contract the ingress negative-id guard defends for
    // external producers (r10 advice). Magnitude stays ~epochMs (~1e12),
    // so the documented id-space map is unchanged.
    val id = GraftApi.manualIdFloor.updateAndGet(prev => math.min(-now.getTime, prev - 1))
    LifecycleEvent(id, "job_exec_update", "origination", uuid,
      s"manual-$uuid-${now.getTime}", now, now, 0, disable_downstream = false)
  }

  def runByPipelineUuid(uuid: String, now: Timestamp,
                        running: Dataset[RunningJob],
                        incubating: Dataset[IncubRow]): Dispatcher.StepResult =
    dispatch(Seq(manualOrigination(uuid, now)), running, incubating, now)

  /** GET /pipeline/event/history (D10 semantics; stub in reference). */
  def eventHistory(events: Dataset[LifecycleEvent], now: Timestamp,
                   pipelineUuid: Option[String] = None,
                   sinceSeconds: Option[Long] = None,
                   maxRecords: Option[Int] = None): DataFrame =
    EventLog.history(events, now,
      sinceSeconds.getOrElse(cfg.historySinceSeconds), pipelineUuid,
      maxRecords = maxRecords.getOrElse(cfg.historyMaxRecords))

  // --- runs (facade.py:80-98) ------------------------------------------
  /** GET /pipeline/running (E2). */
  def runningJobs(statuses: Seq[String] = Seq("running", "waiting", "pending"),
                  pipelineUuid: Option[String] = None,
                  limit: Int = 10): DataFrame =
    engines.filteredJobs(spark, statuses, pipelineUuid, limit)

  /** POST /pipeline/abort (E3/E6). */
  def abort(execUuid: String): Unit = engines.abort(execUuid)

  /** GET /pipeline/logs (E5). */
  def logs(engine: EngineBackend, execUuid: String, maxKb: Int = 10): String =
    engine.logs(execUuid, maxKb)

  // --- scheduler (S4) ---------------------------------------------------
  /** One cron tick: synthetic origination events for due schedules. */
  def cronTick(now: Timestamp): Dataset[LifecycleEvent] =
    Cron.tick(spark, catalog.defs, now)

  // --- single-use runs, incubation point ops, sys config ---------------
  /** POST /pipeline/dispatcher/run_single_use (`facade.py:80-83`) —
    * submit an UNREGISTERED definition straight to its engine: no
    * catalog write, exec uuid minted here, source tagged 'singleuse'.
    * Returns the exec uuid for status/log/abort follow-ups. */
  def runSingleUse(d: PipelineDef, job: EngineJob,
                   now: Timestamp = new Timestamp(System.currentTimeMillis())): String = {
    val execUuid = s"exec-${d.pipeline_uuid}-singleuse-${now.getTime}"
    engines.submit(d.engine, Submission(d.pipeline_uuid, execUuid,
      Map("requestor" -> "singleuse"), 0), job)
    execUuid
  }

  /** GET /pipeline/incubation/update (D15, `facade.py:109-114`) —
    * point-update one incubating row's waiting slots; an absent obj_id
    * is the reference's 404 path. Metadata-plane point op: the
    * existence probe is a bounded lookup, the rewrite is distributed. */
  def updateIncubating(incubating: Dataset[IncubRow], objId: String,
                       updates: Map[String, String]): Dataset[IncubRow] = {
    import org.apache.spark.sql.functions.col
    require(incubating.where(col("obj_id") === objId).limit(1).count() == 1,
      s"Could not update entry for id=$objId") // facade.py:113
    incubating.map(r =>
      if (r.obj_id == objId) r.copy(triggers = r.triggers ++ updates) else r)(
      Encoders.product[IncubRow])
  }

  /** DELETE /pipeline/incubation/delete (D16, `facade.py:116-118`). */
  def deleteIncubating(incubating: Dataset[IncubRow], objId: String): Dataset[IncubRow] =
    incubating.where(org.apache.spark.sql.functions.col("obj_id") =!= objId)

  /** DELETE /pipeline_incubation/flush (D17, `facade.py:120-122`). */
  def flushIncubating(): Dataset[IncubRow] =
    spark.emptyDataset[IncubRow](Encoders.product[IncubRow])

  /** GET /sys/config (`facade.py:124-126`) — the config as a dict. */
  def sysConfig: Map[String, String] =
    cfg.productElementNames.zip(cfg.productIterator.map(String.valueOf)).toMap
}

object GraftApi {
  /** Floor for minted manual-run event ids: updateAndGet keeps ids
    * strictly decreasing even when several manual runs land in one
    * millisecond (r10 advice — same-ms runs of different pipelines
    * aliased on -epochMs alone). */
  private[api] val manualIdFloor = new java.util.concurrent.atomic.AtomicLong(0L)
}
