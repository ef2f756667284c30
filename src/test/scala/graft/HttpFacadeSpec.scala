package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Auth, GraftApi, HttpFacade, SecuredGraftApi}
import graft.meta.Fixtures
import graft.orchestration.{Catalog, EngineManager, LocalSparkEngine}

/** The HTTP adapter exercised end-to-end over loopback with the JDK
  * HTTP client: route → role gate → engine → JSON, for the reference's
  * 18 facade endpoints (facade.py:30-126). Closes r5 missing #1 — the
  * reference is LED by its network surface, so the rebuild's facade
  * must be driven as one, not only as a library.
  */
class HttpFacadeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val Admin = "admin-token"
  private val Read = "read-token"

  private def newFacade(): HttpFacade = {
    val api = new GraftApi(spark, Catalog(Fixtures.defsDS(spark)),
      Fixtures.edgesDS(spark), new EngineManager(Seq(new LocalSparkEngine(spark))))
    val policy = new Auth.Policy(
      new Auth.StaticTokenVerifier(Map(
        Admin -> Seq("Data-Admin"),
        Read -> Seq("Data-Analyst"))),
      apiTokens = Set.empty)
    new HttpFacade(new SecuredGraftApi(api, policy), spark)
  }

  private val client = HttpClient.newHttpClient()

  private def call(base: String, method: String, path: String,
                   token: Option[String] = None,
                   body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .method(method,
        if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def withFacade(f: (HttpFacade, String) => Unit): Unit = {
    val facade = newFacade()
    val addr = facade.start(0)
    try f(facade, s"http://127.0.0.1:${addr.getPort}")
    finally facade.stop()
  }

  test("18 reference endpoints are routed") {
    assert(newFacade().routeCount == 18)
  }

  test("logged => applied: the durable event append runs only AFTER effects apply; a failed step rolls the in-memory log back (r8 review)") {
    import java.sql.Timestamp
    import graft.model.LifecycleEvent
    val facade = newFacade()
    val now = new Timestamp(System.currentTimeMillis())
    val ev = LifecycleEvent(9901L, "job_exec_update", "origination", "report-weekly",
      "exec-ordering-1", now, now, 0, disable_downstream = false)
    val durable = scala.collection.mutable.ArrayBuffer.empty[Seq[LifecycleEvent]]
    facade.eventSink.set(batch => durable += batch)
    // first attempt: the submission sink (where the service persists
    // state and submits) throws — the step fails mid-apply
    facade.submissionSink.set(_ => throw new RuntimeException("boom: persist failed"))
    intercept[RuntimeException](facade.ingest(Seq(ev), now))
    assert(durable.isEmpty,
      "a batch whose effects failed must NOT reach the durable log — a replay deduped on that log would be lost forever")
    assert(facade.eventLog.get().filter(_.event_id == 9901L).isEmpty,
      "the in-memory log union must roll back with the failed step")
    // retry (the MQ stream's replay): with the sink healthy the same
    // batch applies and only then reaches the durable log
    facade.submissionSink.set(_ => ())
    facade.ingest(Seq(ev), now)
    assert(durable.map(_.map(_.event_id)) == Seq(Seq(9901L)))
    assert(facade.eventLog.get().filter(_.event_id == 9901L).count() == 1)
  }

  test("list/describe/downstream/fetch_body over HTTP with a read token") {
    withFacade { (_, base) =>
      val list = call(base, "POST", "/pipeline/config/list?pipeline_prefix=report-", Some(Read))
      assert(list.statusCode() == 200)
      assert(list.body().split("\"pipeline_uuid\"").length - 1 == 3)

      val desc = call(base, "GET", "/pipeline/config/describe?pipeline_uuid=report-daily", Some(Read))
      assert(desc.statusCode() == 200 && desc.body().contains("\"report-daily\""))

      val down = call(base, "GET", "/pipeline/config/downstream?pipeline_uuid=report-daily", Some(Read))
      assert(down.statusCode() == 200)
      assert(down.body().split("\"pipeline_uuid\"").length - 1 == 4)
      assert(!down.body().contains("pipeline_body"), "downstream must be header-only")

      val body = call(base, "GET", "/pipeline_config/fetch_pipeline_body?pipeline_uuid=report-daily", Some(Read))
      assert(body.statusCode() == 200 && body.body().contains("pipeline_uuid"))
    }
  }

  test("auth: anonymous 403, read token on admin verb 403, bad param 400, bad method 405") {
    withFacade { (_, base) =>
      assert(call(base, "POST", "/pipeline/config/list?pipeline_prefix=report-").statusCode() == 403)
      assert(call(base, "DELETE", "/pipeline/config/flush?pipeline_prefix=report-", Some(Read))
        .statusCode() == 403)
      // invalid prefix alphabet -> the D2 require -> 400
      assert(call(base, "POST", "/pipeline/config/list?pipeline_prefix=NOPE%21", Some(Read))
        .statusCode() == 400)
      assert(call(base, "GET", "/pipeline/config/list?pipeline_prefix=report-", Some(Read))
        .statusCode() == 405)
    }
  }

  test("auth scheme: non-Bearer and fused-Bearer credentials are anonymous (403), r7 review") {
    withFacade { (_, base) =>
      def withHeader(h: String): Int = {
        val b = HttpRequest.newBuilder(URI.create(base + "/pipeline/config/list?pipeline_prefix=report-"))
          .method("POST", HttpRequest.BodyPublishers.noBody())
          .header("Authorization", h)
        client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      assert(withHeader(s"Basic $Read") == 403, "wrong scheme must not pass the token through")
      assert(withHeader(s"Bearer$Read") == 403, "fused scheme+token must not authenticate")
      assert(withHeader(s"Bearer $Read") == 200, "the correct scheme still works")
      assert(withHeader(s"bearer $Read") == 200, "scheme is case-insensitive (RFC 9110)")
    }
  }

  test("malformed bodies are 400, not 500 (r7 review)") {
    withFacade { (_, base) =>
      // broken JSON and a valid-but-empty object both fail loudly at
      // the boundary instead of surfacing encoder NPEs
      assert(call(base, "POST", "/pipeline/config/create_or_replace", Some(Admin),
        "not json at all").statusCode() == 400)
      assert(call(base, "POST", "/pipeline/config/create_or_replace", Some(Admin),
        "{}").statusCode() == 400)
      assert(call(base, "GET", "/pipeline/incubation/update?obj_id=x", Some(Admin),
        "][").statusCode() == 400)
    }
  }

  test("run_by_pipeline_uuid joins the event history like every other ingress (r7 review)") {
    withFacade { (_, base) =>
      val now = Fixtures.NOW.getTime
      assert(call(base, "POST",
        s"/pipeline/dispatcher/run_by_pipeline_uuid?pipeline_uuid=ingest-orders&now_epoch_ms=$now",
        Some(Admin)).statusCode() == 200)
      val h = call(base, "GET",
        s"/pipeline/dispatcher/event/history?now_epoch_ms=$now&since_seconds=86400&pipeline_uuid=ingest-orders",
        Some(Read))
      assert(h.statusCode() == 200, h.body())
      assert(h.body().contains("manual-ingest-orders"),
        s"the synthesized origination must appear in history: ${h.body()}")
    }
  }

  test("upsert rejects trigger rows that belong to another pipeline (r7 review)") {
    withFacade { (_, base) =>
      val body =
        """{"def":{"pipeline_uuid":"inject-a","description":"x","retry_max":0,
          |"concurrency":true,"engine":"spark-local","engine_args":"{}",
          |"triggers_op":"any","tags_team":"t","tags_env":"dev","pipeline_body":"{}"},
          |"triggers":[{"pipeline_uuid":"report-daily","trigger_uuid":"ingest-orders","op":"any"}]}"""
          .stripMargin
      val r = call(base, "POST", "/pipeline/config/create_or_replace", Some(Admin), body)
      assert(r.statusCode() == 400, s"stray-edge injection must be rejected: ${r.body()}")
      assert(r.body().contains("inject-a"))
    }
  }

  test("dispatch over HTTP: origination event yields a submission and appends history") {
    withFacade { (_, base) =>
      val now = Fixtures.NOW.getTime
      val ev =
        s"""{"event_id":900,"event_type":"job_exec_update","event_subtype":"origination",
           |"pipeline_uuid":"ingest-orders","exec_uuid":"exec-http-900",
           |"event_time":"2024-01-31T23:00:00.000Z","received_time":"2024-01-31T23:00:00.000Z",
           |"retry_count":0,"disable_downstream":false}""".stripMargin
      val r = call(base, "POST", s"/pipeline/dispatcher/event?now_epoch_ms=$now", Some(Admin), ev)
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains("\"ingest-orders\""), s"no submission in: ${r.body()}")

      // read verb over the state the POST appended
      val h = call(base, "GET",
        s"/pipeline/dispatcher/event/history?now_epoch_ms=$now&since_seconds=86400&pipeline_uuid=ingest-orders",
        Some(Read))
      assert(h.statusCode() == 200, h.body())
      assert(h.body().contains("exec-http-900"))

      // read token cannot dispatch
      assert(call(base, "POST", s"/pipeline/dispatcher/event?now_epoch_ms=$now", Some(Read), ev)
        .statusCode() == 403)

      // reserved-negative-id invariant holds on the HTTP ingress too
      // (r9 advice: it was only enforced on the MQ path, so an HTTP
      // producer could mint ids that alias engine callbacks in the log)
      val neg = ev.replace("\"event_id\":900", "\"event_id\":-900")
      val rn = call(base, "POST", s"/pipeline/dispatcher/event?now_epoch_ms=$now", Some(Admin), neg)
      assert(rn.statusCode() == 400, s"negative external id must be rejected: ${rn.body()}")
      assert(rn.body().contains("reserved"), rn.body())
    }
  }

  test("dispatch over HTTP: two-parent child incubates, then releases on the second success") {
    withFacade { (facade, base) =>
      val now = Fixtures.NOW.getTime
      def success(id: Long, pipeline: String) =
        s"""{"event_id":$id,"event_type":"job_exec_update","event_subtype":"success",
           |"pipeline_uuid":"$pipeline","exec_uuid":"exec-$id",
           |"event_time":"2024-01-31T23:00:00.000Z","received_time":"2024-01-31T23:00:00.000Z",
           |"retry_count":0,"disable_downstream":false}""".stripMargin
      val r1 = call(base, "POST", s"/pipeline/dispatcher/event?now_epoch_ms=$now", Some(Admin),
        success(901, "clean-orders"))
      assert(r1.statusCode() == 200, r1.body())
      assert(!r1.body().contains("join-orders-customer"), "one of two parents must not release")
      assert(facade.incubating.get().count() >= 1, "partial child must incubate in facade state")

      val r2 = call(base, "POST", s"/pipeline/dispatcher/event?now_epoch_ms=$now", Some(Admin),
        success(902, "clean-customer"))
      assert(r2.statusCode() == 200, r2.body())
      assert(r2.body().contains("join-orders-customer"),
        s"second parent success must release the child: ${r2.body()}")
    }
  }

  test("create_or_replace + delete round-trip over HTTP") {
    withFacade { (_, base) =>
      val body =
        """{"def":{"pipeline_uuid":"http-new","description":"via http","retry_max":0,
          |"concurrency":true,"engine":"spark-local","engine_args":"{}",
          |"triggers_op":"any","tags_team":"data","tags_env":"dev",
          |"pipeline_body":"{}"},
          |"triggers":[{"pipeline_uuid":"http-new","trigger_uuid":"report-daily","op":"any"}]}"""
          .stripMargin
      assert(call(base, "POST", "/pipeline/config/create_or_replace", Some(Admin), body)
        .statusCode() == 200)
      val desc = call(base, "GET", "/pipeline/config/describe?pipeline_uuid=http-new", Some(Read))
      assert(desc.body().contains("\"http-new\""))
      assert(call(base, "DELETE", "/pipeline/config/delete?pipeline_uuid=http-new", Some(Admin))
        .statusCode() == 200)
      val gone = call(base, "GET", "/pipeline/config/describe?pipeline_uuid=http-new", Some(Read))
      assert(gone.body() == "[]")
    }
  }

  test("running/sys_config/incubation_flush round out the verb surface") {
    withFacade { (facade, base) =>
      val run = call(base, "GET", "/pipeline/dispatcher/running?limit=5", Some(Read))
      assert(run.statusCode() == 200 && run.body().startsWith("["))
      val cfg = call(base, "GET", "/sys/config", Some(Read))
      assert(cfg.statusCode() == 200 && cfg.body().contains("historyMaxRecords"))
      assert(call(base, "DELETE", "/pipeline_incubation/flush", Some(Admin)).statusCode() == 200)
      assert(facade.incubating.get().count() == 0)
    }
  }
}
