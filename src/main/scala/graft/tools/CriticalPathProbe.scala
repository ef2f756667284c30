package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MetaQueries

/** Weak-scaling probe for `ns_dag_critical_path` (results →
  * BASELINE.md): rounds-to-fixpoint is the DAG's longest-path length
  * (a graph property), per-round cost one hash join + a dst-keyed
  * max — so wall should track DEPTH at fixed size and stay near-flat
  * in WIDTH at fixed depth. Probed on layered DAGs: width×depth
  * grids where each node triggers 2 nodes of the next layer.
  *
  * Run: `sbt "runMain graft.tools.CriticalPathProbe"`
  */
object CriticalPathProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Layered DAG: node (l, i) → ((l+1, i), (l+1, (i+1) mod width)). */
  private def layered(spark: SparkSession, width: Long, depth: Int) = {
    spark.range(width * (depth - 1)).select(
      (col("id") / width).cast("long").as("l"), (col("id") % width).as("i"))
      .select(explode(array(
        struct(concat_ws("-", col("l"), col("i")).as("src"),
          concat_ws("-", col("l") + 1, col("i")).as("dst")),
        struct(concat_ws("-", col("l"), col("i")).as("src"),
          concat_ws("-", col("l") + 1, pmod(col("i") + 1, lit(width))).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(width: Long, depth: Int): (Long, Double) = {
      val e = layered(spark, width, depth).cache(); e.count()
      val (lvls, t) = time(
        MetaQueries.criticalPathCore(e, maxIters = depth + 2)
          .agg(max("sched_level")).collect()(0).getLong(0))
      e.unpersist()
      (lvls, t)
    }
    run(1000, 8) // warm
    val (d1, t1) = run(100000, 8)    // 800k nodes, depth 8
    val (d2, t2) = run(1000000, 8)   // 8M nodes, depth 8 — 10x width
    val (d3, t3) = run(100000, 32)   // depth 32 — 4x depth
    println(f"critical_path probe: width 100k depth 8 (max=$d1) $t1%.2f s; " +
      f"width 1M depth 8 (max=$d2) $t2%.2f s -> 10x width in ${t2 / t1}%.2f x; " +
      f"width 100k depth 32 (max=$d3) $t3%.2f s -> 4x depth in ${t3 / t1}%.2f x")
    spark.stop()
  }
}
