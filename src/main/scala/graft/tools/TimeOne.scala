package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock timer for local iteration — the bench's
  * measurement discipline (same session config, warm fixture pass,
  * best-of-3) without paying the full 180-query sweep to read one row.
  *
  * Run: `sbt "runMain graft.tools.TimeOne ns_text_perceptron[,more]"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <query[,query...]>")
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      // match the bench session (r15): AQE off by default locally, same knob
      .config("spark.sql.adaptive.enabled",
        sys.props.get("SPARK_GRAFT_AQE").orElse(sys.env.get("SPARK_GRAFT_AQE")).getOrElse("false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000).count()
      graft.meta.Fixtures.defsDS(spark).count()
      graft.sources.Tables.names.foreach(n => graft.sources.Tables(spark, sfDir, n).count())
    } catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time-one] $name best3=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")} sf=$sfDir")
    }
    spark.stop()
  }
}
