package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Weak-scaling probe for sequence packing (the round-2 plan-audit
  * scale-killer: a per-language global window funnels the corpus
  * through #languages reducers). Measures the global-window
  * formulation vs the distributed two-phase prefix sum on 1× and 10×
  * corpora, and on a worst-case single-language corpus where the
  * global window degenerates to ONE reducer task.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.PackScaleProbe"`
  * Results are documented in BASELINE.md ("Weak-scaling check").
  */
object PackScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Force the full packing computation downstream of the offsets. */
  private def runPack(withOffsets: DataFrame): Long =
    withOffsets
      .groupBy(col("lang"), floor(col("start_off") / 2048.0).as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .count()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("pack-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // sanity anchor: the real documents table (the oracle-checked input)
    val real = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .cache()
    val nReal = real.count()

    // packing consumes only (doc_id, lang, n_tokens), so weak-scaling
    // uses a synthesized token table big enough that per-reducer volume —
    // not fixed overhead — dominates: 2M docs at 1x, 20M at 10x.
    def corpus(nDocs: Long, nLangs: Int): DataFrame =
      spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat(lit("l"), (col("id") % nLangs).cast("string")).as("lang"),
        (lit(50) + col("id") % 300).cast("long").as("n_tokens"))
        .repartition(32).cache()

    val base = corpus(2L * 1000 * 1000, 5); base.count()
    val x10 = corpus(20L * 1000 * 1000, 5); x10.count()
    // worst case for the global window: one language, one reducer
    val mono1 = corpus(2L * 1000 * 1000, 1); mono1.count()
    val mono10 = corpus(20L * 1000 * 1000, 1); mono10.count()

    def bench(tag: String, docs: DataFrame): Unit = {
      // warm + best-of-2, matching Bench.scala methodology
      def best(f: => Long): Double = { time(f); math.min(time(f)._2, time(f)._2) }
      val g = best(runPack(TextOps.globalStartOffsets(docs)))
      val d = best(runPack(TextOps.distributedStartOffsets(docs)))
      println(f"[probe] $tag%-18s global=$g%6.2fs distributed=$d%6.2fs")
    }

    println(s"[probe] real sf-dir corpus: $nReal docs; synthetic: 2M at 1x, 20M at 10x")
    bench("real-docs", real)
    bench("5-lang 1x (2M)", base)
    bench("5-lang 10x (20M)", x10)
    bench("1-lang 1x (2M)", mono1)
    bench("1-lang 10x (20M)", mono10)

    // --- connected-components weak scaling -----------------------------
    // synthetic near-dup graph: chains of 4 (nodes 4k..4k+3) — every
    // round is one shuffle join; rounds track chain diameter, not corpus
    // size, so 10x nodes should cost ~1x rounds x 10x per-round work
    def chainEdges(nNodes: Long): DataFrame =
      spark.range(nNodes).where(col("id") % 4 =!= 3)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        .repartition(32).cache()
    for (n <- Seq(1L * 1000 * 1000, 10L * 1000 * 1000)) {
      val edges = chainEdges(n); edges.count()
      val t0 = System.nanoTime()
      val nClusters = graft.operators.Dedup.connectedComponents(edges)
        .select("cluster_id").distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] cc ${n / 1000000}%2dM nodes     clusters=$nClusters%8d  time=$secs%6.2fs")
      edges.unpersist()
    }
    spark.stop()
  }
}
