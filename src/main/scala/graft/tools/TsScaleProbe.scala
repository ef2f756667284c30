package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Weak-scaling probe for `ns_ts_simsearch` (results → BASELINE.md):
  * the stage-1 candidate scan is a map-side 6-term integer computation
  * against broadcast query sketches, so wall should track corpus size
  * ~linearly with no pairwise term — probed at 100k vs 1M users by
  * driving the SAME two-stage plan over synthetic daily-count series
  * (id-derived, deterministic).
  *
  * Run: `sbt "runMain graft.tools.TsScaleProbe"`
  */
object TsScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Synthetic (user_id, s0..s29, g0..g5) series frame: counts are a
    * deterministic hash mix of (user, day) — same shape the operator's
    * private seriesFrame produces from events. */
  private def synthSeries(spark: SparkSession, users: Long): DataFrame = {
    val dayCols = (0 until 30).map(i =>
      pmod(hash(col("id"), lit(i)).cast("long"), lit(20L)).as(s"s$i"))
    val base = spark.range(users).select(col("id").as("user_id") +: dayCols: _*)
    val segCols = (0 until 6).map(j =>
      (0 until 5).map(i => col(s"s${j * 5 + i}")).reduce(_ + _).as(s"g$j"))
    base.select(col("user_id") +: (0 until 30).map(i => col(s"s$i")) ++: segCols: _*)
  }

  /** The operator's REAL two-stage core — no more verbatim copy (r12
    * review: the probe's private duplicate could drift silently from
    * the operator it claims to measure; TimeSeries.simSearchCore is
    * now frame-parameterized precisely so this drives it). */
  private def twoStage(series: DataFrame, refine: Int = 50): DataFrame =
    graft.operators.TimeSeries.simSearchCore(series, refine)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture-path sanity: the probe's plan is the operator's plan
    val fixture = TimeSeries.simSearch(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
    println(s"fixture rows: $fixture")

    val small = synthSeries(spark, 100000L).cache(); small.count()
    val big = synthSeries(spark, 1000000L).cache(); big.count()
    val (_, warm) = time(twoStage(small).count())
    val (n1, t1) = time(twoStage(small).count())
    val (n10, t10) = time(twoStage(big).count())
    println(f"ts_simsearch: 100k users -> $n1 rows in $t1%.2f s (warmup $warm%.2f); " +
      f"1M users -> $n10 rows in $t10%.2f s; 10x corpus in ${t10 / t1}%.2f x wall")
    spark.stop()
  }
}
