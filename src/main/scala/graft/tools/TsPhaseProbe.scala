package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway phase-timing probe for the r14 ts_simsearch rewrite —
  * times the τ phase and the expansion phase separately and reports
  * the expansion-set size per query (the τ-cut health signal). */
object TsPhaseProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def synthSeries(spark: SparkSession, users: Long): DataFrame = {
    val dayCols = (0 until 30).map(i =>
      pmod(hash(col("id"), lit(i)).cast("long"), lit(20L)).as(s"s$i"))
    val base = spark.range(users).select(col("id").as("user_id") +: dayCols: _*)
    val segCols = (0 until 6).map(j =>
      (0 until 5).map(i => col(s"s${j * 5 + i}")).reduce(_ + _).as(s"g$j"))
    base.select(col("user_id") +: (0 until 30).map(i => col(s"s$i")) ++: segCols: _*)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val big =
      if (sys.env.get("TS_PROBE_REAL").isDefined) {
        val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val f = graft.operators.TimeSeries.seriesFrame(spark, dir)
        println(s"real series rows: ${f.count()}")
        f
      } else { val b = synthSeries(spark, 1000000L).cache(); b.count(); b }
    // warm
    graft.operators.TimeSeries.simSearchCore(big).count()
    val (n, total) = time(graft.operators.TimeSeries.simSearchCore(big).count())
    println(f"total: $n rows in $total%.2f s")
    // phase costs via the debug hook
    val (qr, tQ) = time(graft.operators.TimeSeries.collectQueries(big))
    println(f"collectQueries: $tQ%.2f s (${qr.size} queries)")
    val (tau, tTau) = time(graft.operators.TimeSeries.debugTau(big))
    println(f"tau phase: $tTau%.2f s, tau=$tau")
    val (sizes, tExp) = time(graft.operators.TimeSeries.debugExpansionSizes(big))
    println(f"expansion sizes: $sizes in $tExp%.2f s")
    val (n2, tFinal) = time(graft.operators.TimeSeries.simSearchCore(big).count())
    println(f"full again: $n2 rows in $tFinal%.2f s")
    val p = graft.operators.TimeSeries.simSearchCore(big).queryExecution.executedPlan.toString
    println("WindowGroupLimit in final plan: " + p.contains("WindowGroupLimit"))
    println("threshold conf: " + spark.conf.getOption(
      "spark.sql.optimizer.windowGroupLimitThreshold"))
    spark.stop()
  }
}
