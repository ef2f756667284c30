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

    // Adversarial bounded-collect row (r9 verdict weak #2): a corpus of
    // ALL-UNIQUE tokens (the Heaps-law worst case — every "word" a
    // distinct hash-like string) against the capped trainer. The
    // driver transfer is the min(cap, vocab) TakeOrdered rows, not the
    // full vocabulary: with maxVocab=50k over 2M unique words the
    // collect is 50k rows whatever the corpus size.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val unique = spark.range(2000000)
      .select(concat(lit("w"), md5(col("id").cast("string"))).as("word"), lit(1L).as("freq"))
    val t0 = System.nanoTime()
    val merges = graft.operators.TextBpe.bpeTrainFast(unique, numMerges = 16,
      minCount = 1L, maxVocab = 50000)
    println(f"[bpetime] adversarial 2M-unique-word vocab, cap 50k: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s, merges=${merges.size} " +
      "(driver transfer = 50k rows, bounded by maxVocab not by Heaps law)")
    spark.stop()
  }
}
