package graft.tools

import org.apache.spark.sql.SparkSession

/** ANN recall@k table (r5 verdict #7, clustered fixture r6 verdict #6):
  * every approximate top-k family vs the exact brute force on the SAME
  * registered queries the correctness gate runs — measured on BOTH the
  * driver's near-uniform embeddings (the documented WORST case for
  * RP/truncation: no direction is privileged) and a deterministic
  * mixture-of-Gaussians fixture (the DESIGN regime: real embedding
  * spaces are clustered, which is what IVF/PQ/RP exploit). Published
  * to BASELINE.md so a probe-count or codebook regression shows up as
  * a number in the regime that matters, not hidden inside the uniform
  * noise floor; the clustered floors are hard-gated in
  * RecallFloorsSpec.
  *
  * Run: `sbt "runMain graft.tools.RecallProbe [sfDir]"`
  */
object RecallProbe {

  /** Deterministic mixture-of-Gaussians embeddings fixture, same
    * schema as the driver's table (vec_id BIGINT, embedding
    * ARRAY<FLOAT>, label INT): `centers` unit-sphere centroids,
    * per-point Gaussian noise σ=0.12, L2-normalized. Driver-side
    * generation (n·dim floats, MBs) so the bytes are seed-stable
    * regardless of partitioning. */
  def writeClusteredFixture(spark: SparkSession, path: String, n: Int = 2000,
                            dim: Int = 64, centers: Int = 16, seed: Long = 42L): Unit = {
    val rnd = new java.util.Random(seed)
    def normalize(v: Array[Float]): Array[Float] = {
      val s = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / s)
    }
    val ctrs = Array.fill(centers)(normalize(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val rows = (0 until n).map { i =>
      val c = ctrs(i % centers)
      val v = normalize(Array.tabulate(dim)(d => c(d) + 0.12f * rnd.nextGaussian().toFloat))
      (i.toLong, v.toSeq, i % centers)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "CAST(label AS INT) AS label")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/embeddings.parquet")
  }

  val families: Seq[(String, String)] = Seq(
    "lsh" -> "ns_vec_topk_lsh",
    "ivf" -> "ns_vec_topk_ivf",
    "ivf_kmeans" -> "ns_vec_topk_ivf_kmeans",
    "int8" -> "ns_vec_topk_quant",
    "trunc16" -> "ns_vec_topk_trunc",
    "rp" -> "ns_vec_topk_rp",
    "pq" -> "ns_vec_topk_pq",
    "ivfpq" -> "ns_vec_topk_ivfpq")

  /** recall@5 per family against `ns_vec_topk` on the given dir. */
  def recalls(spark: SparkSession, dir: String): Map[String, (Double, Int)] = {
    def pairs(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("ns_vec_topk")
    families.map { case (label, q) =>
      val approx = pairs(q)
      label -> (((approx intersect exact).size.toDouble / exact.size, approx.size))
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val clusteredDir = java.nio.file.Files.createTempDirectory("graft-recall-clustered").toString
    writeClusteredFixture(spark, clusteredDir)

    val uniform = recalls(spark, dir).toMap
    val clustered = recalls(spark, clusteredDir).toMap
    println(s"[recall] uniform=$dir clustered=mixture-of-16-gaussians(n=2000,dim=64,seed=42) k=5")
    families.foreach { case (label, _) =>
      val (ru, rc) = (uniform(label), clustered(label))
      println(f"[recall] $label%-10s uniform=${ru._1}%.3f (cand=${ru._2}%d)  clustered=${rc._1}%.3f (cand=${rc._2}%d)")
    }
    spark.stop()
  }
}
