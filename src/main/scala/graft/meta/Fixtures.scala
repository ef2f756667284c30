package graft.meta

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.sources.Tables

/** Deterministic metadata fixtures (FIXTURES.md §A).
  *
  * The metadata plane (pipeline defs, DAG edges, running jobs, incubation
  * state) models the reference's MongoDB collections
  * (`/root/reference/src/kalytical/core/data_provider.py:21-24`). Fixture
  * rows are defined ONCE here as plain Scala data; both the Spark
  * `Dataset`s and the DuckDB oracle `VALUES` CTEs are generated from the
  * same Seqs, so engine and oracle cannot drift.
  *
  * `lifecycle_events` is different: to get event volume that scales with
  * the scale factor, it is DERIVED deterministically from the shared
  * `events` parquet table by an identical transform on both sides (Spark
  * DataFrame here, SQL CTE in [[sqlCtes]]).
  *
  * All timestamps are UTC wall times constructed via `Instant` (immune to
  * JVM default-timezone differences). `NOW` is the fixed evaluation
  * instant for age/debounce rules (SURVEY §7 risk 2).
  */
object Fixtures {

  def ts(s: String): Timestamp =
    Timestamp.from(LocalDateTime.parse(s.replace(' ', 'T')).toInstant(ZoneOffset.UTC))

  /** Fixed "now" for deterministic age/debounce cutoffs. */
  val NOW: Timestamp = ts("2024-02-01 00:00:00")
  val NowSql = "TIMESTAMP '2024-02-01 00:00:00'"
  /** Concurrency re-queue debounce (reference `concurrency_debounce_seconds`, job_culler.py:22). */
  val DebounceSeconds = 300L
  /** Incubation age-out (reference `incubating_job_age_out_seconds`, job_culler.py:35). */
  val AgeOutSeconds = 86400L

  // ---------------------------------------------------------------------
  // pipeline_defs + pipeline_triggers — a 4-level, 40-node DAG
  // ---------------------------------------------------------------------

  /** child -> (op, parents). Reference: `TriggersOnModel` (pipeline_models.py:11-19). */
  val triggerSpecs: Seq[(String, (String, Seq[String]))] = Seq(
    "clean-orders"         -> ("any", Seq("ingest-orders")),
    "clean-lineitem"       -> ("any", Seq("ingest-lineitem")),
    "clean-customer"       -> ("any", Seq("ingest-customer")),
    "clean-part"           -> ("any", Seq("ingest-part")),
    "clean-supplier"       -> ("any", Seq("ingest-supplier")),
    "clean-nation"         -> ("any", Seq("ingest-nation")),
    "join-orders-customer" -> ("all", Seq("clean-orders", "clean-customer")),
    "join-lineitem-part"   -> ("all", Seq("clean-lineitem", "clean-part")),
    "join-supplier-nation" -> ("all", Seq("clean-supplier", "clean-nation")),
    "agg-revenue"          -> ("all", Seq("join-orders-customer", "join-lineitem-part")),
    "agg-supplier-balance" -> ("any", Seq("join-supplier-nation")),
    "report-daily"         -> ("all", Seq("agg-revenue", "agg-supplier-balance", "join-orders-customer")),
    "report-weekly"        -> ("any", Seq("report-daily")),
    "report-monthly"       -> ("all", Seq("report-daily", "agg-revenue")),
    "stream-metrics"       -> ("any", Seq("ingest-orders")),
    "flaky-export"         -> ("any", Seq("report-daily")),
    // edge referencing a nonexistent def — exercises the K6 dangling-trigger guard
    "ghost-child"          -> ("all", Seq("ghost-parent", "report-daily"))
  )
  private val specMap = triggerSpecs.toMap

  private val sourceUuids = Seq(
    "ingest-orders", "ingest-lineitem", "ingest-customer",
    "ingest-part", "ingest-supplier", "ingest-nation", "ingest-region")

  private def mkDef(uuid: String, i: Int, retryMax: Int = 0, conc: Boolean = false,
                    schedule: Option[String] = None,
                    team: Option[String] = None, env: Option[String] = None,
                    body: Option[String] = None): PipelineDef = {
    val op = specMap.get(uuid).map(_._1)
    PipelineDef(
      pipeline_uuid = uuid,
      description = s"Pipeline $uuid",
      retry_max = retryMax,
      concurrency = conc,
      engine = "spark-local",
      engine_args = s"""{"cpu_count": ${1 + i % 4}, "memory_gi": ${2 * (1 + i % 4)}}""",
      schedule = schedule,
      triggers_op = op,
      scheduler_tracking_id = schedule.map(_ => s"kalytical-api-trigger-$uuid"),
      tags_team = team,
      tags_env = env,
      pipeline_body = body)
  }

  /** The 40-pipeline catalog. Deterministic; index drives filler variation. */
  val defs: Seq[PipelineDef] = {
    val sources = sourceUuids.zipWithIndex.map { case (u, i) =>
      mkDef(u, i, schedule = Some(s"0 ${i % 24} * * *"),
        team = Some("data-eng"), env = Some("prod"),
        body = Some(s"""{"steps": ${i + 1}, "source": "${u.stripPrefix("ingest-")}"}"""))
    }
    val cleans = triggerSpecs.filter(_._1.startsWith("clean-")).map(_._1).zipWithIndex.map {
      case (u, i) => mkDef(u, i + 7, team = Some("data-eng"),
        env = Some(if (i % 2 == 0) "prod" else "dev"),
        body = Some(s"""{"steps": 2}"""))
    }
    val joins = Seq("join-orders-customer", "join-lineitem-part", "join-supplier-nation")
      .zipWithIndex.map { case (u, i) =>
        mkDef(u, i + 13, retryMax = 1, team = Some("analytics"), env = Some("prod"))
      }
    val aggs = Seq("agg-revenue", "agg-supplier-balance").zipWithIndex.map { case (u, i) =>
      mkDef(u, i + 16, retryMax = 2, team = Some("analytics"), env = Some("prod"))
    }
    val reports = Seq("report-daily", "report-weekly", "report-monthly").zipWithIndex.map {
      case (u, i) => mkDef(u, i + 18, team = Some("analytics"), env = Some("prod"),
        body = Some(s"""{"steps": ${5 + i}, "format": "html"}"""))
    }
    val specials = Seq(
      mkDef("stream-metrics", 21, conc = true, team = Some("ml"), env = Some("prod")),
      mkDef("flaky-export", 22, retryMax = 3, team = Some("ml"), env = Some("dev")),
      mkDef("ghost-child", 23, team = None, env = Some("dev")),
      mkDef("solo-maintenance", 24, schedule = Some("30 2 * * 0"), team = Some("data-eng"), env = None),
      // grandfathered uuid violating ^[a-z0-9-]+$ — exercises the K13 regex check
      mkDef("legacy_import_v2", 25, team = Some("ml"), env = Some("dev")))
    val teams = Seq(Some("data-eng"), Some("analytics"), Some("ml"), None)
    val adhoc = (0 until 14).map { i =>
      mkDef(f"adhoc-task-$i%02d", 26 + i, retryMax = i % 3, conc = i % 4 == 1,
        team = teams(i % 4), env = Some(if (i % 2 == 0) "dev" else "prod"))
    }
    sources ++ cleans ++ joins ++ aggs ++ reports ++ specials ++ adhoc
  }
  require(defs.size == 40, s"expected 40 defs, got ${defs.size}")

  /** Normalized edges (explode of triggers_on.pipeline_uuids). */
  val edges: Seq[PipelineTrigger] = for {
    (child, (op, parents)) <- triggerSpecs
    parent <- parents
  } yield PipelineTrigger(child, parent, op)

  /** idx -> pipeline_uuid used to derive lifecycle_events from `events`:
    * 40 real defs + one unknown uuid (K9 unknown-origination probe).
    */
  val eventPipelineMap: Seq[(Int, String)] =
    defs.map(_.pipeline_uuid).zipWithIndex.map(_.swap) :+ (40 -> "unknown-pipeline")

  // ---------------------------------------------------------------------
  // running_jobs — live execution state (RunningPipelineModel)
  // ---------------------------------------------------------------------

  val running: Seq[RunningJob] = {
    val statuses = Seq("running", "pending", "success", "failed", "waiting",
      "running", "aborted", "timed_out", "running", "pending")
    val pipelines = Seq(
      "report-daily", "stream-metrics", "ingest-orders", "clean-orders",
      "agg-revenue", "ingest-lineitem", "join-lineitem-part", "flaky-export",
      "stream-metrics", "adhoc-task-03",
      "clean-customer", "report-weekly", "ingest-part", "adhoc-task-01",
      "join-orders-customer", "ingest-customer", "agg-supplier-balance",
      "clean-part", "solo-maintenance", "adhoc-task-07",
      "report-daily", "ingest-orders", "clean-lineitem", "adhoc-task-05")
    pipelines.zipWithIndex.map { case (p, i) =>
      val st = statuses(i % statuses.size)
      val start = if (i % 5 == 4) None
        else Some(ts(f"2024-01-31 ${8 + i % 12}%02d:${(i * 7) % 60}%02d:00"))
      val end = if (Seq("success", "failed", "aborted", "timed_out").contains(st) && i % 5 != 4)
        Some(ts(f"2024-01-31 ${10 + i % 12}%02d:${(i * 11) % 60}%02d:00")) else None
      RunningJob(f"exec-r$i%02d", p, "spark-local", f"exec-$p-${i % 3}", st, start, end)
    }
  }

  // ---------------------------------------------------------------------
  // incubating + incubating_triggers — deferred-run state
  // ---------------------------------------------------------------------

  /** Covers every culler rule (job_culler.py:17-44): waiting-all,
    * all-satisfied (K18), debounce-expired concurrency (K17), aged-out
    * (K16), duplicates per pipeline for oldest-first (K14), and
    * retry_count spread for the K15 retry gate.
    */
  val incubating: Seq[Incubating] = Seq(
    // dependencies, all triggers waiting
    Incubating("inc-00", "join-orders-customer", ts("2024-01-31 22:00:00"), Some("exec-1001"), "dependencies", 0),
    // same pipeline, older row -> oldest-first target (K14)
    Incubating("inc-01", "join-orders-customer", ts("2024-01-31 20:30:00"), Some("exec-0999"), "dependencies", 1),
    Incubating("inc-02", "join-orders-customer", ts("2024-01-31 23:15:00"), Some("exec-1005"), "dependencies", 0),
    // all satisfied (K18 fires)
    Incubating("inc-03", "agg-revenue", ts("2024-01-31 21:00:00"), Some("exec-1002"), "dependencies", 0),
    // partially satisfied
    Incubating("inc-04", "report-daily", ts("2024-01-31 21:30:00"), Some("exec-1003"), "dependencies", 2),
    // another all-satisfied, but aged out too (K16 ∩ K18)
    Incubating("inc-05", "report-monthly", ts("2024-01-30 10:00:00"), Some("exec-0900"), "dependencies", 0),
    // concurrency rows: older than debounce (K17 fires)
    Incubating("inc-06", "report-daily", ts("2024-01-31 23:50:00"), Some("exec-1006"), "concurrency", 0),
    Incubating("inc-07", "stream-metrics", ts("2024-01-31 23:58:30"), Some("exec-1007"), "concurrency", 1),
    // concurrency row within debounce (K17 must NOT fire)
    Incubating("inc-08", "ingest-orders", ts("2024-01-31 23:57:00"), Some("exec-1008"), "concurrency", 0),
    // aged out dependencies row (K16 fires)
    Incubating("inc-09", "ghost-child", ts("2024-01-30 08:00:00"), None, "dependencies", 0),
    // retry ladder for K15 (flaky-export retry_max=3, join-* retry_max=1)
    Incubating("inc-10", "flaky-export", ts("2024-01-31 22:10:00"), Some("exec-1010"), "dependencies", 3),
    Incubating("inc-11", "flaky-export", ts("2024-01-31 22:20:00"), Some("exec-1011"), "dependencies", 2),
    Incubating("inc-12", "join-lineitem-part", ts("2024-01-31 22:30:00"), Some("exec-1012"), "dependencies", 1),
    Incubating("inc-13", "join-supplier-nation", ts("2024-01-31 22:40:00"), Some("exec-1013"), "dependencies", 0),
    // duplicates for K14 on a second pipeline
    Incubating("inc-14", "agg-supplier-balance", ts("2024-01-31 19:00:00"), Some("exec-1014"), "dependencies", 0),
    Incubating("inc-15", "agg-supplier-balance", ts("2024-01-31 19:00:00"), Some("exec-1015"), "dependencies", 0),
    Incubating("inc-16", "clean-orders", ts("2024-01-31 23:59:00"), Some("exec-1016"), "concurrency", 2),
    Incubating("inc-17", "adhoc-task-02", ts("2024-01-29 06:00:00"), None, "dependencies", 1)
  )

  val incubatingTriggers: Seq[IncubatingTrigger] = Seq(
    IncubatingTrigger("inc-00", "clean-orders", "waiting"),
    IncubatingTrigger("inc-00", "clean-customer", "waiting"),
    IncubatingTrigger("inc-01", "clean-orders", "exec-0901"),
    IncubatingTrigger("inc-01", "clean-customer", "waiting"),
    IncubatingTrigger("inc-02", "clean-orders", "waiting"),
    IncubatingTrigger("inc-02", "clean-customer", "waiting"),
    IncubatingTrigger("inc-03", "join-orders-customer", "exec-0902"),
    IncubatingTrigger("inc-03", "join-lineitem-part", "exec-0903"),
    IncubatingTrigger("inc-04", "agg-revenue", "exec-0904"),
    IncubatingTrigger("inc-04", "agg-supplier-balance", "waiting"),
    IncubatingTrigger("inc-04", "join-orders-customer", "exec-0905"),
    IncubatingTrigger("inc-05", "report-daily", "exec-0906"),
    IncubatingTrigger("inc-05", "agg-revenue", "exec-0907"),
    IncubatingTrigger("inc-09", "ghost-parent", "waiting"),
    IncubatingTrigger("inc-09", "report-daily", "exec-0908"),
    IncubatingTrigger("inc-10", "report-daily", "waiting"),
    IncubatingTrigger("inc-11", "report-daily", "exec-0909"),
    IncubatingTrigger("inc-12", "clean-lineitem", "waiting"),
    IncubatingTrigger("inc-12", "clean-part", "waiting"),
    IncubatingTrigger("inc-13", "clean-supplier", "exec-0910"),
    IncubatingTrigger("inc-13", "clean-nation", "waiting"),
    IncubatingTrigger("inc-14", "join-supplier-nation", "waiting"),
    IncubatingTrigger("inc-15", "join-supplier-nation", "exec-0911"),
    IncubatingTrigger("inc-17", "clean-orders", "waiting")
  )

  // ---------------------------------------------------------------------
  // Spark-side Datasets
  // ---------------------------------------------------------------------

  def defsDS(spark: SparkSession): Dataset[PipelineDef] =
    spark.createDataset(defs)(Encoders.product[PipelineDef])
  def edgesDS(spark: SparkSession): Dataset[PipelineTrigger] =
    spark.createDataset(edges)(Encoders.product[PipelineTrigger])
  def runningDS(spark: SparkSession): Dataset[RunningJob] =
    spark.createDataset(running)(Encoders.product[RunningJob])
  def incubatingDS(spark: SparkSession): Dataset[Incubating] =
    spark.createDataset(incubating)(Encoders.product[Incubating])
  def incubatingTriggersDS(spark: SparkSession): Dataset[IncubatingTrigger] =
    spark.createDataset(incubatingTriggers)(Encoders.product[IncubatingTrigger])

  def eventPipelineMapDF(spark: SparkSession): DataFrame =
    spark.createDataFrame(eventPipelineMap).toDF("idx", "pipeline_uuid")

  /** lifecycle_events derived from the shared `events` table — scales
    * with sf; transform mirrored exactly by the SQL CTE in [[sqlCtes]].
    * The 41-row map join broadcasts (tiny dimension).
    */
  def lifecycleEventsDF(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val m = broadcast(eventPipelineMapDF(spark))
    ev.join(m, ev("user_id") % 41 === m("idx"))
      .select(
        ev("event_id"),
        lit("job_exec_update").as("event_type"),
        when(ev("event_type") === "click", "success")
          .when(ev("event_type") === "error", "failure")
          .when(ev("event_type") === "purchase", "origination")
          .when(ev("event_type") === "signup", "submitted")
          .otherwise("running").as("event_subtype"),
        m("pipeline_uuid"),
        concat(lit("exec-"), ev("event_id")).as("exec_uuid"),
        ev("ts").as("event_time"),
        expr("timestamp_micros(unix_micros(ts) + (event_id % 10) * 1000000)").as("received_time"),
        (ev("event_id") % 4).cast("int").as("retry_count"),
        (ev("event_id") % 7 === 0).as("disable_downstream"))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle CTEs — generated from the SAME Seqs above
  // ---------------------------------------------------------------------

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sqlOpt(o: Option[String]): String = o.map(sqlStr).getOrElse("NULL")
  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private def sqlTs(t: Timestamp): String =
    "TIMESTAMP '" + tsFmt.format(t.toInstant.atOffset(ZoneOffset.UTC).toLocalDateTime) + "'"
  private def sqlOptTs(o: Option[Timestamp]): String = o.map(sqlTs).getOrElse("NULL")
  private def sqlBool(b: Boolean): String = if (b) "TRUE" else "FALSE"

  private def valuesTable(name: String, cols: Seq[(String, String)], rows: Seq[Seq[String]]): String = {
    val castSelect = cols.map { case (c, t) => s"CAST($c AS $t) AS $c" }.mkString(", ")
    val colNames = cols.map(_._1).mkString(", ")
    val vals = rows.map(_.mkString("(", ", ", ")")).mkString(",\n    ")
    s"""$name AS (SELECT $castSelect FROM (VALUES
    $vals) AS t($colNames))"""
  }

  lazy val defsCte: String = valuesTable("pipeline_defs",
    Seq("pipeline_uuid" -> "VARCHAR", "description" -> "VARCHAR", "retry_max" -> "INTEGER",
      "concurrency" -> "BOOLEAN", "engine" -> "VARCHAR", "engine_args" -> "VARCHAR",
      "schedule" -> "VARCHAR", "triggers_op" -> "VARCHAR", "scheduler_tracking_id" -> "VARCHAR",
      "tags_team" -> "VARCHAR", "tags_env" -> "VARCHAR", "pipeline_body" -> "VARCHAR"),
    defs.map(d => Seq(sqlStr(d.pipeline_uuid), sqlStr(d.description), d.retry_max.toString,
      sqlBool(d.concurrency), sqlStr(d.engine), sqlStr(d.engine_args), sqlOpt(d.schedule),
      sqlOpt(d.triggers_op), sqlOpt(d.scheduler_tracking_id), sqlOpt(d.tags_team),
      sqlOpt(d.tags_env), sqlOpt(d.pipeline_body))))

  lazy val edgesCte: String = valuesTable("pipeline_triggers",
    Seq("pipeline_uuid" -> "VARCHAR", "trigger_uuid" -> "VARCHAR", "op" -> "VARCHAR"),
    edges.map(e => Seq(sqlStr(e.pipeline_uuid), sqlStr(e.trigger_uuid), sqlStr(e.op))))

  lazy val runningCte: String = valuesTable("running_jobs",
    Seq("exec_uuid" -> "VARCHAR", "pipeline_uuid" -> "VARCHAR", "engine" -> "VARCHAR",
      "engine_tracking_id" -> "VARCHAR", "engine_status" -> "VARCHAR",
      "start_time" -> "TIMESTAMP", "end_time" -> "TIMESTAMP"),
    running.map(r => Seq(sqlStr(r.exec_uuid), sqlStr(r.pipeline_uuid), sqlStr(r.engine),
      sqlStr(r.engine_tracking_id), sqlStr(r.engine_status),
      sqlOptTs(r.start_time), sqlOptTs(r.end_time))))

  lazy val incubatingCte: String = valuesTable("incubating",
    Seq("obj_id" -> "VARCHAR", "pipeline_uuid" -> "VARCHAR", "create_time" -> "TIMESTAMP",
      "created_by_uuid" -> "VARCHAR", "reason" -> "VARCHAR", "retry_count" -> "INTEGER"),
    incubating.map(i => Seq(sqlStr(i.obj_id), sqlStr(i.pipeline_uuid), sqlTs(i.create_time),
      sqlOpt(i.created_by_uuid), sqlStr(i.reason), i.retry_count.toString)))

  lazy val incubatingTriggersCte: String = valuesTable("incubating_triggers",
    Seq("obj_id" -> "VARCHAR", "trigger_uuid" -> "VARCHAR", "status" -> "VARCHAR"),
    incubatingTriggers.map(t => Seq(sqlStr(t.obj_id), sqlStr(t.trigger_uuid), sqlStr(t.status))))

  lazy val eventMapCte: String = valuesTable("event_pipeline_map",
    Seq("idx" -> "INTEGER", "pipeline_uuid" -> "VARCHAR"),
    eventPipelineMap.map { case (i, u) => Seq(i.toString, sqlStr(u)) })

  /** SQL mirror of [[lifecycleEventsDF]]. */
  lazy val lifecycleEventsCte: String =
    """lifecycle_events AS (
    SELECT e.event_id,
           'job_exec_update' AS event_type,
           CASE e.event_type WHEN 'click' THEN 'success' WHEN 'error' THEN 'failure'
                WHEN 'purchase' THEN 'origination' WHEN 'signup' THEN 'submitted'
                ELSE 'running' END AS event_subtype,
           m.pipeline_uuid,
           'exec-' || CAST(e.event_id AS VARCHAR) AS exec_uuid,
           CAST(e.ts AS TIMESTAMP) AS event_time,
           CAST(e.ts AS TIMESTAMP) + (e.event_id % 10) * INTERVAL 1 SECOND AS received_time,
           CAST(e.event_id % 4 AS INTEGER) AS retry_count,
           (e.event_id % 7 = 0) AS disable_downstream
    FROM events e JOIN event_pipeline_map m ON e.user_id % 41 = m.idx)"""

  /** Full WITH-prefix for metadata oracle queries. DuckDB prunes unused CTEs. */
  lazy val sqlCtes: String =
    Seq(defsCte, edgesCte, runningCte, incubatingCte, incubatingTriggersCte,
      eventMapCte, lifecycleEventsCte).mkString("WITH\n", ",\n", "\n")

  /** Prepend all fixture CTEs to a metadata oracle query. */
  def withCtes(sql: String): String = sqlCtes + sql
}
