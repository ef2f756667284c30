package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Submission
import graft.orchestration.{EngineJob, EngineManager, InMemoryPodApi, K8sPodEngine}
import graft.orchestration.K8sPodEngine._

/** Pins the pod MARSHALLING against the reference's intended V1Pod
  * (engine.py:107-150) field by field — the part of the K8s backend
  * that is engine logic rather than transport — plus the backend verbs
  * over the in-memory PodApi. */
class K8sPodEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val cfg = K8sConfig(authSecret = "s3cret", apiEndpoint = "http://api.test")
  private val sub = Submission("clean-orders", "exec-42", Map("ingest-orders" -> "exec-41"), 2)

  test("marshalPod: reference pod fields (name, env, limits, placement, labels)") {
    val pod = marshalPod(cfg, sub, Map(
      "pipeline_image" -> "corp/runner:9",
      "cpu_count" -> "4", "memory_gi" -> "8Gi",
      "instance_type" -> "r5.xlarge"))
    // name: exec_uuid-pipeline_uuid-retry_count (engine.py:108)
    assert(pod.metadata.name == "exec-42-clean-orders-2")
    assert(pod.metadata.labels == Map(
      "pod_source" -> "graft", "exec_uuid" -> "exec-42",
      "pipeline_uuid" -> "clean-orders")) // engine.py:150
    val c = pod.spec.containers.head
    assert(c.image == "corp/runner:9")
    assert(c.limits == Map("cpu" -> "4", "memory" -> "8Gi")) // engine.py:147-148
    val env = c.env.map(e => e.name -> e.value).toMap
    assert(env("PIPELINE_UUID") == "clean-orders")
    assert(env("EXEC_UUID") == "exec-42")
    assert(env("RETRY_COUNT") == "2")
    assert(env("SOURCE_UUID") == """{"ingest-orders":"exec-41"}""")
    assert(env("GRAFT_AUTH_SECRET") == "s3cret")
    assert(env("GRAFT_API_ENDPOINT") == "http://api.test")
    assert(env.contains("MQ_CALLBACK_URL"))
    // placement + security (engine.py:149)
    assert(pod.spec.nodeSelector("graft.k8s.node/workload") == "pipeline")
    assert(pod.spec.nodeSelector("beta.kubernetes.io/instance-type") == "r5.xlarge")
    assert(pod.spec.tolerations ==
      Seq(Toleration("node.kubernetes.io/pipeline", "Exists", "NoSchedule")))
    assert(pod.spec.fsGroup == 100)
    assert(pod.spec.restartPolicy == "Never")
    assert(pod.spec.serviceAccountName == cfg.serviceAccountName)
  }

  test("marshalPod: authSecretRef switches GRAFT_AUTH_SECRET to a secretKeyRef, no secret bytes in the manifest") {
    val prod = cfg.copy(authSecretRef = Some(SecretKeyRef("graft-auth", "token")))
    val pod = marshalPod(prod, sub, Map.empty)
    val auth = pod.spec.containers.head.env.find(_.name == "GRAFT_AUTH_SECRET").get
    assert(auth.valueFrom.contains(SecretKeyRef("graft-auth", "token")))
    assert(auth.value == "", "secretKeyRef mode must not carry a literal value")
    // the secret string must appear NOWHERE in the marshalled pod
    assert(!pod.toString.contains("s3cret"))
    // literal mode (the reference's engine.py:138-142 shape) unchanged
    val lit = marshalPod(cfg, sub, Map.empty)
      .spec.containers.head.env.find(_.name == "GRAFT_AUTH_SECRET").get
    assert(lit.value == "s3cret" && lit.valueFrom.isEmpty)
  }

  test("manifestJson: the wire V1Pod parses back with both env shapes, no secret bytes in secretKeyRef mode") {
    import spark.implicits._
    val prod = cfg.copy(authSecretRef = Some(SecretKeyRef("graft-auth", "token")))
    val json = manifestJson(marshalPod(prod, sub, Map("pipeline_image" -> "corp/runner:9")))
    // parse through Spark's JSON reader — a real API server would do
    // the equivalent; failPast malformed JSON
    val row = spark.read.option("mode", "FAILFAST").json(Seq(json).toDS()).head()
    assert(row.getAs[String]("apiVersion") == "v1" && row.getAs[String]("kind") == "Pod")
    val meta = row.getStruct(row.fieldIndex("metadata"))
    assert(meta.getAs[String]("name") == "exec-42-clean-orders-2")
    val spec = row.getStruct(row.fieldIndex("spec"))
    assert(spec.getAs[String]("restartPolicy") == "Never")
    val c = spec.getSeq[org.apache.spark.sql.Row](spec.fieldIndex("containers")).head
    assert(c.getAs[String]("image") == "corp/runner:9")
    val envs = c.getSeq[org.apache.spark.sql.Row](c.fieldIndex("env"))
    val auth = envs.find(_.getAs[String]("name") == "GRAFT_AUTH_SECRET").get
    val ref = auth.getStruct(auth.fieldIndex("valueFrom"))
      .getStruct(0) // secretKeyRef
    assert(ref.getAs[String]("name") == "graft-auth" && ref.getAs[String]("key") == "token")
    assert(!json.contains("s3cret"), "secret bytes must not appear in the manifest")
    // literal mode serializes the {name, value} shape
    val lit = manifestJson(marshalPod(cfg, sub, Map.empty))
    assert(lit.contains(""""name":"GRAFT_AUTH_SECRET","value":"s3cret""""))
    assert(!lit.contains("valueFrom"))
    // control characters in marshalled values must escape (RFC 8259) —
    // a multi-line default command is the realistic carrier
    val ctl = manifestJson(marshalPod(
      cfg.copy(defaultArgs = Seq("line1\nline2\ttab")), sub, Map.empty))
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(ctl).toDS()).head()
    val pc = parsed.getStruct(parsed.fieldIndex("spec"))
    val cont = pc.getSeq[org.apache.spark.sql.Row](pc.fieldIndex("containers")).head
    assert(cont.getSeq[String](cont.fieldIndex("args")) == Seq("line1\nline2\ttab"))
  }

  test("submit: argv stays a typed list — whitespace-bearing arguments never fragment (r7 review)") {
    val api = new InMemoryPodApi
    val engine = new K8sPodEngine(cfg, api)
    engine.submit(sub, EngineJob.Command(
      Seq("/bin/sh", "-c", "echo hello world"), Map("pipeline_image" -> "corp/sh:1")))
    val c = api.list(cfg.namespace).head.pod.spec.containers.head
    assert(c.command == Seq("/bin/sh"))
    assert(c.args == Seq("-c", "echo hello world"),
      s"the -c script must survive as ONE argument: ${c.args}")
    assert(c.image == "corp/sh:1") // env map still feeds the other keys
  }

  test("marshalPod: engine_args fall back to config defaults") {
    val pod = marshalPod(cfg, sub, Map.empty)
    val c = pod.spec.containers.head
    assert(c.image == cfg.defaultImage)
    assert(c.command == cfg.defaultCommand)
    assert(c.args == cfg.defaultArgs)
    assert(c.limits == Map("cpu" -> "1", "memory" -> "1Gi"))
  }

  test("backend verbs over the in-memory pod api: submit/jobs/logs/abort") {
    val engine = new K8sPodEngine(cfg, new InMemoryPodApi)
    engine.submit(sub, EngineJob.Command(Seq("python", "run.py"), Map("cpu_count" -> "2")))
    val jobs = engine.jobs(spark).collect()
    assert(jobs.length == 1)
    assert(jobs.head.exec_uuid == "exec-42")
    assert(jobs.head.engine == "K8sPodEngine")
    assert(jobs.head.engine_status == "running")
    assert(jobs.head.engine_tracking_id == "exec-42-clean-orders-2")
    // argv threads into pipeline_command/args
    val logs = engine.logs("exec-42")
    assert(logs.contains("PIPELINE_UUID=clean-orders"))
    // byte cap truncates from the front (tail semantics)
    val capped = new InMemoryPodApi
    val e2 = new K8sPodEngine(cfg, capped)
    e2.submit(sub, EngineJob.Command(Seq("x"), Map.empty))
    assert(capped.logs(cfg.namespace, "exec-42-clean-orders-2", 10).length == 10)
    engine.abort("exec-42")
    assert(engine.jobs(spark).isEmpty)
    // double abort: the reference's 404 path (engine.py:167-169)
    intercept[IllegalArgumentException](
      new K8sPodEngine(cfg, new InMemoryPodApi).logs("exec-42"))
  }

  test("spark closures are rejected (pods host containers)") {
    val engine = new K8sPodEngine(cfg, new InMemoryPodApi)
    intercept[IllegalArgumentException](
      engine.submit(sub, EngineJob.SparkClosure(_ => ())))
  }

  test("registry resolves K8sPodEngine by name next to the local backends") {
    val mgr = new EngineManager(Seq(
      new graft.orchestration.LocalSparkEngine(spark),
      new K8sPodEngine(cfg, new InMemoryPodApi)))
    assert(mgr.backend("K8sPodEngine").name == "K8sPodEngine")
  }
}
