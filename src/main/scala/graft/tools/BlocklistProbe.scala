package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.sources.Tables

/** Round-8 probe: the Aho–Corasick blocklist expression vs the naive
  * per-term `contains` chain, as the BLOCKLIST GROWS — the axis that
  * matters for safety filtering (real badword lists run 10³–10⁴
  * terms). The automaton is O(bytes) per document regardless of term
  * count; the chain re-scans every document once per term. The chain
  * is also the oracle's formulation, so this probe doubles as a
  * result-equality check at every size.
  *
  * Run: `sbt "runMain graft.tools.BlocklistProbe"`
  */
object BlocklistProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select("doc_id", "text").cache()
    docs.count()

    // terms: the corpus vocabulary crossed with itself as 2-grams —
    // realistic phrase blocklist entries with heavy prefix sharing.
    // 100×100 = 10⁴ phrases: a REAL badword-list size (r8 verdict
    // item 2 — the probe must cover the regime the O(bytes) claim is
    // made for, not stop at the old 64-term bitmask cap).
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").count().orderBy(col("count").desc)
      .limit(100).collect().map(_.getString(0)).sorted
    val phrases = (for { a <- vocab; b <- vocab } yield s"$a $b").toSeq.distinct.sorted

    def nativeMatches(terms: Seq[String]): Long =
      docs.select(size(TextExpressions.blocklistMatches(col("text"), terms)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    def chainMatches(terms: Seq[String]): Long = {
      // the oracle shape: one contains() per term, summed
      val flags = terms.map(t => when(col("text").contains(t), 1L).otherwise(0L))
      docs.select(flags.reduce(_ + _).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }

    Seq(4, 16, 64, 256, 1024).foreach { k =>
      val terms = phrases.take(k)
      nativeMatches(terms); chainMatches(terms) // warm both
      val (rn, tn) = time(nativeMatches(terms))
      val (rc, tc) = time(chainMatches(terms))
      require(rn == rc, s"native ($rn) != contains-chain ($rc) at $k terms")
      println(f"[blk] $k%5d terms: native $tn%.2f s, contains-chain $tc%.2f s " +
        f"(${tc / tn}%.1fx), $rn matches")
    }
    // 10⁴ terms: the contains-chain is O(bytes × 10⁴) — time the
    // native walk on the full corpus (the claim under test: FLAT in
    // terms) and check equality against the chain on a 200-doc sample
    // where the chain is still affordable.
    val big = phrases.take(10000)
    nativeMatches(big) // warm
    val (rnBig, tnBig) = time(nativeMatches(big))
    val sample = docs.orderBy("doc_id").limit(200).cache()
    sample.count()
    def sampleCount(df: DataFrame, terms: Seq[String], native: Boolean): Long =
      if (native)
        df.select(size(TextExpressions.blocklistMatches(col("text"), terms)).as("n"))
          .agg(sum("n")).collect()(0).getLong(0)
      else {
        val flags = terms.map(t => when(col("text").contains(t), 1L).otherwise(0L))
        df.select(flags.reduce(_ + _).as("n")).agg(sum("n")).collect()(0).getLong(0)
      }
    val sn = sampleCount(sample, big, native = true)
    val sc = sampleCount(sample, big, native = false)
    require(sn == sc, s"native ($sn) != contains-chain ($sc) at ${big.size} terms on sample")
    println(f"[blk] ${big.size}%5d terms: native $tnBig%.2f s full corpus ($rnBig matches); " +
      f"sample equality vs chain OK ($sn)")
    spark.stop()
  }
}
