package graft.tools

import org.apache.spark.sql.SparkSession

/** ANN recall@k table (r5 verdict #7): every approximate top-k family
  * vs the exact brute force on the SAME registered queries the
  * correctness gate runs, at the SF given (default sf0.1, k = 5).
  * Published to BASELINE.md so a probe-count or codebook regression
  * shows up as a number, not a vibe; the per-family spec floors
  * (QueriesSpec, ScaleOpsSpec, VectorsPqSpec) remain the hard gates.
  *
  * Run: `sbt "runMain graft.tools.RecallProbe [sfDir]"`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs("ns_vec_topk")
    val families = Seq(
      "lsh" -> "ns_vec_topk_lsh",
      "ivf" -> "ns_vec_topk_ivf",
      "ivf_kmeans" -> "ns_vec_topk_ivf_kmeans",
      "int8" -> "ns_vec_topk_quant",
      "trunc16" -> "ns_vec_topk_trunc",
      "rp" -> "ns_vec_topk_rp",
      "pq" -> "ns_vec_topk_pq",
      "ivfpq" -> "ns_vec_topk_ivfpq")
    println(f"[recall] sf=$dir k=5 queries=${exact.map(_._1).size}%d")
    families.foreach { case (label, q) =>
      val approx = pairs(q)
      val recall = (approx intersect exact).size.toDouble / exact.size
      println(f"[recall] $label%-10s recall@5=$recall%.3f candidates=${approx.size}%d")
    }
    spark.stop()
  }
}
