package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Multimodal

/** Head-to-head probe for the two floor-class bench rows (r11 verdict
  * #5): `ns_mm_phash_dups_g7` (3.3× DuckDB at 0.31 s absolute) and
  * `ns_mm_video_incremental` (2.8× at 0.18 s) are sub-half-second
  * rows whose ratio is Spark's scheduling floor, not a plan defect —
  * the claim this probe TESTS is that the ratio inverts at real data
  * sizes. The mm fixtures derive all content from `doc_id` alone, so
  * a 10×-sf0.1 synthetic documents table (50k ids) drives both
  * engines through identical work at sf1 scale; the DuckDB side runs
  * the registered oracle SQL over the same table (timed by
  * tools/g7_headtohead.py, published in BASELINE.md).
  *
  * Run: `sbt "runMain graft.tools.G7HeadToHead /tmp/graft_sf1"`
  */
object G7HeadToHead {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // scheduler warm-up
    for (q <- Seq(Multimodal.phashDupsG7, Multimodal.videoIncremental)) {
      val (n1, cold) = time { q.run(spark, dir).count() }
      val (_, warm) = time { q.run(spark, dir).count() }
      val images = Multimodal.dupMedia(spark, dir).count()
      println(f"[g7-h2h] ${q.name} dir=$dir media_rows=$images%d out_rows=$n1%d " +
        f"cold=$cold%.2fs warm=$warm%.2fs")
    }
    spark.stop()
  }
}
