package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timing for the BPE apply-path rewrite (r6): cold run
  * includes the fast-trainer collect; warm runs measure the
  * vocabulary-map apply + subword aggregation alone. */
object BpeTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(label: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("ns_text_bpe_tokens")(spark, dir).count()
      println(f"[bpetime] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("cold (incl. training)"); t("warm1"); t("warm2")
    spark.stop()
  }
}
