package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

import graft.model._
import graft.orchestration.Dispatcher
import graft.orchestration.Dispatcher.IncubRow

/** Round-6 probe: the dispatcher at a 10⁶-PIPELINE catalog — the
  * regime the r5 verdict flagged for `metaMap`'s defs+edges collect.
  *
  * Synthetic catalog: 10⁶ defs in a binary-ish DAG (pipeline i
  * triggers on i−1; even i also on i/2 with 'all' — so both the
  * run-now and incubate branches fire), 10⁴ success events spread
  * across the id range. Measures `Dispatcher.step` end-to-end, map
  * path (collect+broadcast) vs catalogJoin path (meta via joins),
  * same outputs (counts asserted equal — full set equality is the
  * OrchestrationSpec equivalence test's job at fixture scale).
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR6"` (results → BASELINE.md)
  */
object ScaleProbeR6 {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nEvents = 10000

    val defs: Dataset[PipelineDef] = spark.range(n.toLong).map { i =>
      PipelineDef(s"p-$i", s"synthetic $i", retry_max = 1,
        concurrency = i % 2 == 0, engine = "spark-local", engine_args = "{}",
        schedule = None,
        triggers_op = if (i % 2 == 0) Some("all") else Some("any"),
        scheduler_tracking_id = None, tags_team = None, tags_env = None,
        pipeline_body = None)
    }(Encoders.product[PipelineDef]).cache()
    val edges: Dataset[PipelineTrigger] = spark.range(1L, n.toLong).flatMap { i =>
      val first = PipelineTrigger(s"p-$i", s"p-${i - 1}", if (i % 2 == 0) "all" else "any")
      if (i % 2 == 0) Seq(first, PipelineTrigger(s"p-$i", s"p-${i / 2}", "all"))
      else Seq(first)
    }(Encoders.product[PipelineTrigger]).cache()
    println(s"catalog: ${defs.count()} defs, ${edges.count()} edges")

    val now = new Timestamp(1706742000000L)
    val events = spark.range(nEvents.toLong).map { k =>
      val p = k * (n / nEvents)
      LifecycleEvent(k, "job_exec_update", "success", s"p-$p", s"exec-$k",
        now, now, 0, disable_downstream = false)
    }(Encoders.product[LifecycleEvent]).cache()
    events.count()

    def run(catalogJoin: Boolean): (Long, Long) = {
      val r = Dispatcher.step(spark, defs, edges,
        spark.emptyDataset[RunningJob](Encoders.product[RunningJob]),
        spark.emptyDataset[IncubRow](Encoders.product[IncubRow]),
        events, now, catalogJoin = catalogJoin)
      (r.submissions.count(), r.newIncubating.count())
    }

    // warm both paths once (codegen, scheduler) at a small slice first
    val (mapRes, mapSec) = time(run(catalogJoin = false))
    val (joinRes, joinSec) = time(run(catalogJoin = true))
    require(mapRes == joinRes, s"paths diverged: map=$mapRes join=$joinRes")
    println(f"[r6probe] catalog=$n%d events=$nEvents%d " +
      f"map_path=$mapSec%.2fs join_path=$joinSec%.2fs " +
      f"submissions=${mapRes._1}%d incubating=${mapRes._2}%d")
    spark.stop()
  }
}
