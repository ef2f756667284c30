package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Encoders

import graft.meta.Fixtures
import graft.model.RunningJob
import graft.orchestration.Dispatcher
import graft.streaming.GraftStream

/** End-to-end streaming pipeline: JSON event files in → typed routing +
  * keyed incubation state → gated submissions parquet + history parquet.
  * The full SURVEY §3 lifecycle in one test. */
class GraftStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def ev(id: Long, subtype: String, pipeline: String, retry: Int = 0): String =
    s"""{"event_id": $id, "event_type": "job_exec_update", "event_subtype": "$subtype",
        "pipeline_uuid": "$pipeline", "exec_uuid": "exec-$id",
        "event_time": "2024-01-31T23:0${id % 10}:00Z", "received_time": "2024-01-31T23:0${id % 10}:05Z",
        "retry_count": $retry, "disable_downstream": false}""".replaceAll("\n\\s*", " ")

  test("full streaming pipeline: ingest -> route -> incubate -> gate -> sinks") {
    import spark.implicits._
    val src = SparkSuite.tempDir("gs-src")
    val subs = SparkSuite.tempDir("gs-subs")
    val hist = SparkSuite.tempDir("gs-hist")
    val ckpt = SparkSuite.tempDir("gs-ckpt")

    // batch 1: origination + one failure retry + partial 'all' deps +
    //          a gated pipeline (report-daily is live in the engine)
    Files.writeString(java.nio.file.Path.of(src, "b1.json"), Seq(
      ev(1, "origination", "ingest-orders"),
      ev(2, "origination", "report-daily"),        // gated: running
      ev(3, "failure", "flaky-export", retry = 1), // retry_max=3 -> retry
      ev(4, "success", "clean-orders"),            // join-orders-customer dep 1/2
      "not json at all").mkString("\n"))

    val metas = Dispatcher.metaMap(Fixtures.defsDS(spark), Fixtures.edgesDS(spark))
    val running = Seq(RunningJob("live-1", "report-daily", "spark-local", "t", "running", None, None))
    def runningSnapshot() = spark.createDataset(running)(Encoders.product[RunningJob])

    def runOnce(): Unit = {
      val sinks = GraftStream.start(spark, src,
        Fixtures.defsDS(spark), Fixtures.edgesDS(spark), metas,
        subs, hist, ckpt, () => runningSnapshot(), fixedNow = Some(Fixtures.NOW))
      assert(sinks.submissions.awaitTermination(120000),
        "streaming query did not finish in 120s")
      assert(sinks.history.awaitTermination(120000),
        "streaming query did not finish in 120s")
      // quarantine is ON by default for the JSON-dir entry (r12 review)
      assert(sinks.quarantine.isDefined, "start() must wire the quarantine sink")
      assert(sinks.quarantine.get.awaitTermination(120000))
      sinks.submissions.stop(); sinks.history.stop(); sinks.quarantine.foreach(_.stop())
    }
    runOnce()

    // the malformed line is QUARANTINED under the checkpoint root, not
    // silently dropped (r12 review: the primary entry points passed
    // quarantineDir = None, so EventIngest's advertised quarantine
    // never ran for them)
    val quarantined = spark.read.text(s"$ckpt/quarantined").as[String].collect().toSeq
    assert(quarantined == Seq("not json at all"), s"quarantine: $quarantined")

    val got1 = spark.read.parquet(subs).select("pipeline_uuid").as[String].collect().sorted.toSeq
    // ingest-orders submitted; report-daily gated out; flaky-export retried;
    // join-orders-customer still incubating (1/2 deps)
    assert(got1 == Seq("flaky-export", "ingest-orders"))

    // batch 2 (restart from checkpoint): second dep arrives -> release
    Files.writeString(java.nio.file.Path.of(src, "b2.json"),
      ev(5, "success", "clean-customer"))
    runOnce()

    val got2 = spark.read.parquet(subs).select("pipeline_uuid").as[String].collect().sorted.toSeq
    assert(got2 == Seq("flaky-export", "ingest-orders", "join-orders-customer"),
      s"state should survive restart and release the 'all' child: $got2")

    // history captured all parseable events (4 + 1 across batches)
    assert(spark.read.parquet(hist).count() == 5)
    val retried = spark.read.parquet(subs).where($"pipeline_uuid" === "flaky-export").collect()
    assert(retried.head.getAs[Int]("retry_count") == 2)
  }

  test("r7 parity fixes: deferred sink, quarantine sink, suppressed success, stream/batch history schema") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = SparkSuite.tempDir("gs7-src")
    val subs = SparkSuite.tempDir("gs7-subs")
    val hist = SparkSuite.tempDir("gs7-hist")
    val ckpt = SparkSuite.tempDir("gs7-ckpt")
    val quar = SparkSuite.tempDir("gs7-quar")

    val suppressed = ev(8, "success", "report-daily")
      .replace(""""disable_downstream": false""", """"disable_downstream": true""")
    Files.writeString(java.nio.file.Path.of(src, "b1.json"), Seq(
      ev(6, "origination", "report-daily"),  // gated: running below
      ev(7, "success", "clean-orders"),      // dep 1/2 of join-orders-customer
      suppressed,                            // must trigger NOTHING
      "corrupt {{{").mkString("\n"))

    val metas = Dispatcher.metaMap(Fixtures.defsDS(spark), Fixtures.edgesDS(spark))
    val running = Seq(RunningJob("live-1", "report-daily", "spark-local", "t", "running", None, None))
    val sinks = GraftStream.startFromRaw(spark,
      spark.readStream.schema("value STRING").text(src).toDF("value"),
      Fixtures.defsDS(spark), Fixtures.edgesDS(spark), metas,
      subs, hist, ckpt, () => spark.createDataset(running)(Encoders.product[RunningJob]),
      fixedNow = Some(Fixtures.NOW),
      quarantineDir = Some(quar))
    assert(sinks.submissions.awaitTermination(120000))
    assert(sinks.history.awaitTermination(120000))
    assert(sinks.quarantine.get.awaitTermination(120000))
    sinks.submissions.stop(); sinks.history.stop(); sinks.quarantine.foreach(_.stop())

    // 1. the gated report-daily run is a DEFERRED record, not a silent drop
    val deferred = spark.read.parquet(GraftStream.deferredDir(subs))
      .select("pipeline_uuid").as[String].collect().toSeq
    assert(deferred == Seq("report-daily"), s"blocked run must persist: $deferred")
    // ...and the submissions read skips the underscore-prefixed dir
    assert(spark.read.parquet(subs).where(col("pipeline_uuid") === "report-daily").isEmpty)

    // 2. the corrupt line is quarantined verbatim
    val q = spark.read.text(quar).as[String].collect().toSeq
    assert(q == Seq("corrupt {{{"))

    // 3. the SUPPRESSED success neither fanned out nor satisfied deps:
    //    report-daily's 'any' children did not submit, and a later
    //    agg-revenue 'all' wait would still be empty — here we assert
    //    nothing beyond the deferred row and no fan-out submissions
    val subbed = spark.read.parquet(subs).select("pipeline_uuid").as[String].collect().toSet
    assert(!subbed.contains("report-weekly") && !subbed.contains("flaky-export"),
      s"disable_downstream must suppress streaming fan-out: $subbed")

    // 4. history rows carry EventLog's schema: sink-stamped
    //    received_time, event_date partition — same shape batch writes
    val h = spark.read.parquet(hist)
    assert(h.columns.contains("event_date") && !h.columns.contains("received_ingest"))
    assert(h.where(col("received_time").isNull).isEmpty)
    assert(h.count() == 3) // three parseable events
  }

  test("same pipeline over the Kafka-shaped spool-mq source: identical submissions (S1 parity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val spool = SparkSuite.tempDir("gs-mq-spool")
    val subs = SparkSuite.tempDir("gs-mq-subs")
    val hist = SparkSuite.tempDir("gs-mq-hist")
    val ckpt = SparkSuite.tempDir("gs-mq-ckpt")

    // one file = one message (the SQS body), same events as the file-source run
    val batch1 = Seq(
      ev(1, "origination", "ingest-orders"),
      ev(2, "origination", "report-daily"),
      ev(3, "failure", "flaky-export", retry = 1),
      ev(4, "success", "clean-orders"),
      "not json at all")
    batch1.zipWithIndex.foreach { case (msg, i) =>
      Files.writeString(java.nio.file.Path.of(spool, f"msg-$i%05d.json"), msg)
    }

    val metas = Dispatcher.metaMap(Fixtures.defsDS(spark), Fixtures.edgesDS(spark))
    val running = Seq(RunningJob("live-1", "report-daily", "spark-local", "t", "running", None, None))
    def runOnce(): Unit = {
      val raw = spark.readStream.format("spool-mq").load(spool)
        .select(col("value").cast("string").as("value"))
      val sinks = GraftStream.startFromRaw(spark, raw,
        Fixtures.defsDS(spark), Fixtures.edgesDS(spark), metas,
        subs, hist, ckpt,
        () => spark.createDataset(running)(Encoders.product[RunningJob]),
        fixedNow = Some(Fixtures.NOW))
      assert(sinks.submissions.awaitTermination(120000),
        "streaming query did not finish in 120s")
      assert(sinks.history.awaitTermination(120000),
        "streaming query did not finish in 120s")
      sinks.submissions.stop(); sinks.history.stop()
    }
    runOnce()
    val got1 = spark.read.parquet(subs).select("pipeline_uuid").as[String].collect().sorted.toSeq
    assert(got1 == Seq("flaky-export", "ingest-orders"))

    // a later message arrives; checkpointed offsets resume past batch 1
    Files.writeString(java.nio.file.Path.of(spool, "msg-99999.json"),
      ev(5, "success", "clean-customer"))
    runOnce()
    val got2 = spark.read.parquet(subs).select("pipeline_uuid").as[String].collect().sorted.toSeq
    assert(got2 == Seq("flaky-export", "ingest-orders", "join-orders-customer"),
      s"spool-mq replay should match the file-source run exactly: $got2")
    assert(spark.read.parquet(hist).count() == 5)
  }

  test("spool-mq surfaces the Kafka source schema with per-message offsets") {
    import org.apache.spark.sql.functions.col
    val spool = SparkSuite.tempDir("gs-mq-schema")
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (m, i) =>
      Files.writeString(java.nio.file.Path.of(spool, s"m$i.txt"), m)
    }
    // batch read path (backfill); same schema as spark-sql-kafka
    val df = spark.read.format("spool-mq").load(spool)
    assert(df.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
    val rows = df.select(col("offset"), col("value").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")))
  }

  test("spool-mq admission control: a backlog drains in maxPerTrigger-sized batches (r10 review)") {
    import org.apache.spark.sql.streaming.Trigger
    val spool = SparkSuite.tempDir("gs-mq-cap")
    (0 until 25).foreach { i =>
      Files.writeString(java.nio.file.Path.of(spool, f"m$i%03d.txt"), s"msg-$i")
    }
    // 25 backlogged messages, cap 10: the old plain MicroBatchStream
    // admitted all 25 in one batch regardless of any limit; with
    // SupportsAdmissionControl the checkpointed end offset advances by
    // <= 10 per trigger and AvailableNow drains the rest incrementally
    val q = spark.readStream.format("spool-mq").option("maxPerTrigger", "10").load(spool)
      .writeStream.format("memory").queryName("mq_cap")
      .option("checkpointLocation", SparkSuite.tempDir("gs-mq-cap-ck"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "capped drain did not finish")
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    q.stop()
    assert(spark.table("mq_cap").count() == 25, "every backlogged message must arrive")
    assert(batches.forall(_ <= 10), s"a batch exceeded the cap: $batches")
    assert(batches.length >= 3, s"expected >= 3 capped batches, got $batches")
  }

  test("ingest defaults optional fields and quarantines only missing dispatch keys (r12 review + r12 advice)") {
    import spark.implicits._
    // well-formed JSON, MISSING primitives: PERMISSIVE from_json leaves
    // them null. The reference protocol (runtime_models.py:11-12)
    // declares retry_count/disable_downstream OPTIONAL with defaults
    // (0 / false) — a spec-compliant producer omits them, so the good
    // side must COALESCE them (r12 ADVICE: the first fix quarantined
    // these, silently halting dispatch for conforming clients). Pre-fix
    // the null primitives either crashed .as[LifecycleEvent] on every
    // replay (a permanent poison loop past a checkpointed offset) or,
    // for disable_downstream, silently suppressed the success fan-out.
    val missingRetry = """{"event_id": 40, "event_type": "job_exec_update",
      "event_subtype": "origination", "pipeline_uuid": "p", "exec_uuid": "e",
      "event_time": "2024-01-31T23:00:00Z", "received_time": "2024-01-31T23:00:05Z",
      "disable_downstream": false}""".replaceAll("\n\\s*", " ")
    val missingDd = """{"event_id": 41, "event_type": "job_exec_update",
      "event_subtype": "success", "pipeline_uuid": "p", "exec_uuid": "e",
      "event_time": "2024-01-31T23:00:00Z", "received_time": "2024-01-31T23:00:05Z",
      "retry_count": 0}""".replaceAll("\n\\s*", " ")
    val missingPipeline = """{"event_id": 42, "event_type": "job_exec_update",
      "event_subtype": "success", "exec_uuid": "e",
      "event_time": "2024-01-31T23:00:00Z", "received_time": "2024-01-31T23:00:05Z",
      "retry_count": 0, "disable_downstream": false}""".replaceAll("\n\\s*", " ")
    val goodLine = ev(43, "origination", "ok-pipeline")
    val parsed = graft.streaming.EventIngest.parse(
      Seq(missingRetry, missingDd, missingPipeline, goodLine).toDF("value"))
    // good side: the complete event AND the two defaultable omissions,
    // all DESERIALIZING (the poison vector was exactly this collect
    // throwing on null primitive slots) with reference defaults applied
    val good = parsed.events.collect().sortBy(_.event_id)
    assert(good.map(_.event_id).toSeq == Seq(40L, 41L, 43L), s"good side: ${good.toSeq}")
    val byId = good.map(e => e.event_id -> e).toMap
    assert(byId(40L).retry_count == 0 && !byId(40L).disable_downstream,
      "omitted retry_count must default to 0 (runtime_models.py:11)")
    assert(byId(41L).retry_count == 0 && !byId(41L).disable_downstream,
      "omitted disable_downstream must default to false (runtime_models.py:12)")
    // quarantine side: only the line missing a genuine dispatch key
    val bad = parsed.corrupt.as[String].collect().toSet
    assert(bad == Set(missingPipeline), s"quarantine: $bad")
  }

  test("spool rewind guard: removing consumed files under a live checkpoint fails loudly, not silently remapped (r12 review)") {
    import java.nio.file.{Files => JFiles, Path}
    val dir = SparkSuite.tempDir("gs-mq-rewind")
    (0 until 5).foreach(i => JFiles.writeString(Path.of(dir, f"m$i%03d.json"), s"body-$i"))
    val stream = new graft.sources.mq.SpoolMQStream(dir)
    // checkpoint says 5 consumed; 2 files were archived out from under it
    JFiles.delete(Path.of(dir, "m000.json")); JFiles.delete(Path.of(dir, "m001.json"))
    val e1 = intercept[IllegalStateException] {
      stream.latestOffset(graft.sources.mq.SpoolOffset(5L),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(100))
    }
    assert(e1.getMessage.contains("removed under a live checkpoint"))
    // the slicer itself refuses too (covers the batch-read path)
    val e2 = intercept[IllegalStateException] {
      graft.sources.mq.SpoolMQStream.partitions(dir, 5L, 7L)
    }
    assert(e2.getMessage.contains("removed under a live checkpoint"))
    // an intact spool still slices fine past the guard
    assert(graft.sources.mq.SpoolMQStream.partitions(dir, 1L, 3L).nonEmpty)
  }
}
