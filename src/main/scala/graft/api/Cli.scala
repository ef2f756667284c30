package graft.api

import org.apache.spark.sql.SparkSession

import graft.meta.Fixtures
import graft.orchestration.{Catalog, EngineManager, LocalSparkEngine}

/** `kaly`-style CLI (the reference ships an empty stub with intended
  * usage `kaly create pipeline pipeline.yaml`, `kaly/Readme.md:1-2`).
  * Verbs map 1:1 onto [[GraftApi]]; run via
  * `sbt "runMain graft.api.Cli <verb> [args]"`.
  *
  * Verbs: list [prefix] | describe <uuid> | downstream <uuid> |
  * history <uuid> | running | cron-due <ts>
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // demo catalog = the deterministic fixtures; a deployment loads via MetaStore
    val api = new GraftApi(spark, Catalog(Fixtures.defsDS(spark)),
      Fixtures.edgesDS(spark), new EngineManager(Seq(new LocalSparkEngine(spark))))

    args.toList match {
      case "list" :: rest =>
        api.listPipelines(prefix = rest.headOption).show(100, truncate = false)
      case "describe" :: uuid :: Nil =>
        api.describePipeline(uuid).show(truncate = false)
      case "downstream" :: uuid :: Nil =>
        api.downstream(uuid).select("pipeline_uuid", "triggers_op").show(100, truncate = false)
      case "history" :: uuid :: Nil =>
        val events = Fixtures.lifecycleEventsDF(spark, "/root/testdata/sf0.001")
        events.where(org.apache.spark.sql.functions.col("pipeline_uuid") === uuid)
          .orderBy(org.apache.spark.sql.functions.col("received_time").desc)
          .limit(20).show(truncate = false)
      case "running" :: Nil =>
        api.runningJobs().show(truncate = false)
      case "cron-due" :: ts :: Nil =>
        api.cronTick(Fixtures.ts(ts)).show(truncate = false)
      case other =>
        System.err.println(s"unknown verb: ${other.mkString(" ")}")
        System.err.println("usage: list [prefix] | describe <uuid> | downstream <uuid> | history <uuid> | running | cron-due '<yyyy-MM-dd HH:mm:ss>'")
        sys.exit(2)
    }
    spark.stop()
  }
}
