package graft.api

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.meta.Fixtures
import graft.model.{PipelineDef, PipelineTrigger}
import graft.orchestration.{Catalog, EngineManager, LocalSparkEngine, ProcessEngine}

/** `kaly`-style CLI (the reference ships an empty stub with intended
  * usage `kaly create pipeline pipeline.yaml`, `kaly/Readme.md:1-2`).
  * Verbs map 1:1 onto [[GraftApi]]; run via
  * `sbt "runMain graft.api.Cli <verb> [args]"`.
  *
  * Verbs: list [prefix] | describe <uuid> | downstream <uuid> |
  * history <uuid> | running | cron-due <ts> |
  * create pipeline <def.json> — the reference CLI's one documented
  * verb: a pipeline definition file (JSON here, not YAML — no YAML
  * parser on the offline classpath and the model is 1:1) upserted into
  * the catalog with its trigger edges.
  */
object Cli {

  /** Pipeline-definition file schema: the [[PipelineDef]] columns plus
    * an inline `triggers` array (the reference's embedded
    * `TriggersOnModel`, `pipeline_models.py:11-19`). */
  private val trigSchema = StructType(Seq(
    StructField("trigger_uuid", StringType), StructField("op", StringType)))
  private val defFileSchema: StructType =
    org.apache.spark.sql.Encoders.product[PipelineDef].schema
      .add(StructField("triggers", ArrayType(trigSchema)))

  /** Parse a definition file into (def, edges). Nulls get the model's
    * defaults (`retry_max=0`, `concurrency=false` per
    * `pipeline_models.py:25-27`). */
  def parsePipelineFile(spark: SparkSession, path: String): (PipelineDef, Seq[PipelineTrigger]) = {
    val rows = spark.read.schema(defFileSchema).option("multiLine", "true").json(path)
    val r = rows.head()
    def optS(f: String): Option[String] = Option(r.getAs[String](f))
    val uuid = Option(r.getAs[String]("pipeline_uuid")).getOrElse(
      throw new IllegalArgumentException(s"$path: pipeline_uuid is required"))
    val d = PipelineDef(
      pipeline_uuid = uuid,
      description = optS("description").getOrElse(""),
      retry_max = Option(r.getAs[Any]("retry_max")).map(_.toString.toDouble.toInt).getOrElse(0),
      concurrency = Option(r.getAs[Any]("concurrency")).exists(_ == true),
      engine = optS("engine").getOrElse("spark-local"),
      engine_args = optS("engine_args").getOrElse("{}"),
      schedule = optS("schedule"),
      triggers_op = optS("triggers_op"),
      scheduler_tracking_id = optS("scheduler_tracking_id"),
      tags_team = optS("tags_team"),
      tags_env = optS("tags_env"),
      pipeline_body = optS("pipeline_body"))
    val triggers = Option(r.getAs[scala.collection.Seq[Row]]("triggers"))
      .getOrElse(Seq.empty).toSeq.map { t =>
      PipelineTrigger(uuid, t.getAs[String]("trigger_uuid"),
        Option(t.getAs[String]("op")).getOrElse(d.triggers_op.getOrElse("all")))
    }
    (d, triggers)
  }

  /** Verb dispatch, separated from `main` so ApiSpec can drive the CLI
    * round-trip in-process. Returns a process exit code. */
  def run(api: GraftApi, spark: SparkSession, args: List[String]): Int = args match {
    case "list" :: rest =>
      api.listPipelines(prefix = rest.headOption).show(100, truncate = false); 0
    case "describe" :: uuid :: Nil =>
      api.describePipeline(uuid).show(truncate = false); 0
    case "downstream" :: uuid :: Nil =>
      api.downstream(uuid).select("pipeline_uuid", "triggers_op").show(100, truncate = false); 0
    case "history" :: uuid :: Nil =>
      // fixtures-backed like the demo catalog in main(), but the data
      // dir is configurable (r12 review: a hardcoded /root/testdata
      // path crashed the verb anywhere else) and the query goes
      // through the D10 history semantics instead of a raw sort
      val dir = sys.env.getOrElse("GRAFT_EVENTS_SF_DIR", "/root/testdata/sf0.001")
      val events = Fixtures.lifecycleEventsDF(spark, dir)
        .as[graft.model.LifecycleEvent](
          org.apache.spark.sql.Encoders.product[graft.model.LifecycleEvent])
      // 'now' = the fixture's own latest stamp, so the D10 recency
      // window shows the tail of the fixture rather than an empty set
      // (fixture timestamps are historical relative to wall-clock)
      val now = Option(events
        .agg(org.apache.spark.sql.functions.max("received_time"))
        .collect()(0).getTimestamp(0))
        .getOrElse(new java.sql.Timestamp(System.currentTimeMillis()))
      api.eventHistory(events, now, pipelineUuid = Some(uuid), maxRecords = Some(20))
        .show(truncate = false); 0
    case "running" :: Nil =>
      api.runningJobs().show(truncate = false); 0
    case "cron-due" :: ts :: Nil =>
      api.cronTick(Fixtures.ts(ts)).show(truncate = false); 0
    case "create" :: "pipeline" :: path :: Nil =>
      val (d, triggers) = parsePipelineFile(spark, path)
      api.upsertPipeline(d, triggers)
      println(s"created pipeline ${d.pipeline_uuid} with ${triggers.size} trigger(s)"); 0
    case "delete" :: uuid :: rest if rest.isEmpty || rest == List("--force") =>
      // D6 orphan guard stays on by default; --force = safe_delete=false
      api.deletePipeline(uuid, safeDelete = rest.isEmpty)
      println(s"deleted pipeline $uuid"); 0
    case "flush" :: prefix :: Nil =>
      // D7: bulk delete of the prefix's list result
      api.flushPipelines(prefix)
      println(s"flushed pipelines with prefix '$prefix'"); 0
    case "run" :: uuid :: Nil =>
      // facade run_by_pipeline_uuid: synthesize an origination event
      // against the live running/incubating views
      import org.apache.spark.sql.Encoders
      val res = api.runByPipelineUuid(uuid,
        new java.sql.Timestamp(System.currentTimeMillis()),
        // full running view (no page limit): the concurrency gate must
        // see every live run, not the default 10-row page
        api.runningJobs(limit = Int.MaxValue).as(Encoders.product[graft.model.RunningJob]),
        spark.emptyDataset(Encoders.product[graft.orchestration.Dispatcher.IncubRow]))
      val subs = res.submissions.collect()
      subs.foreach(s => println(s"submitted ${s.pipeline_uuid} exec=${s.exec_uuid}"))
      if (subs.isEmpty) { System.err.println(s"no submission for $uuid (unknown or deferred)"); 1 }
      else 0
    case "abort" :: execUuid :: Nil =>
      api.abort(execUuid)
      println(s"abort requested for $execUuid"); 0
    case other =>
      System.err.println(s"unknown verb: ${other.mkString(" ")}")
      System.err.println(
        "usage: list [prefix] | describe <uuid> | downstream <uuid> | history <uuid> | " +
        "running | cron-due '<yyyy-MM-dd HH:mm:ss>' | create pipeline <def.json> | " +
        "delete <uuid> [--force] | flush <prefix> | run <uuid> | abort <exec_uuid>")
      2
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // demo catalog = the deterministic fixtures; a deployment loads via MetaStore
    val api = new GraftApi(spark, Catalog(Fixtures.defsDS(spark)),
      Fixtures.edgesDS(spark),
      new EngineManager(Seq(new LocalSparkEngine(spark), new ProcessEngine)))
    val code = run(api, spark, args.toList)
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
