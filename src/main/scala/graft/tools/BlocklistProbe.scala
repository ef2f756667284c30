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
    // balanced tree fold: a left-nested reduce builds a |terms|-deep Add
    // chain that overflows the analyzer's recursion at ~10³ terms
    def treeSum(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cols.size == 1) cols.head
      else {
        val (a, b) = cols.splitAt(cols.size / 2)
        treeSum(a) + treeSum(b)
      }
    def chainMatches(terms: Seq[String]): Long = {
      // the oracle shape: one contains() per term, summed
      val flags = terms.map(t => when(col("text").contains(t), 1L).otherwise(0L))
      docs.select(treeSum(flags).as("n")).agg(sum("n")).collect()(0).getLong(0)
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
    // where the chain is still affordable. The corpus vocabulary only
    // yields ~10³ distinct phrases, so the list is padded to 10⁴ with
    // vocabulary-prefixed terms that DON'T occur — precisely the
    // real-badword-list shape (most of a curated list never matches,
    // but every term still costs the chain a full scan and costs the
    // automaton only trie nodes).
    val filler = (0 until 20000).iterator
      .map(k => s"${vocab(k % vocab.length)}_${k}q")
      .filterNot(phrases.contains).take(10000 - math.min(phrases.size, 9000)).toSeq
    val big = (phrases.take(9000) ++ filler).distinct.sorted.take(10000)
    nativeMatches(big) // warm
    val (rnBig, tnBig) = time(nativeMatches(big))
    // Equality reference at 10⁴ terms: plain JVM contains() on a
    // 200-doc sample. The SQL contains-chain is not even buildable at
    // this size — 10⁴ `when(contains)` nodes blow Spark's generated
    // method past the JVM's 64 KB limit (InternalCompilerException) —
    // which is itself part of the finding: the naive formulation stops
    // being expressible long before the automaton breaks a sweat.
    val sampleRows = docs.orderBy("doc_id").limit(200)
      .collect().map(_.getString(1))
    val refCount = sampleRows.map(t => big.count(t.contains(_)).toLong).sum
    val sn = docs.orderBy("doc_id").limit(200)
      .select(size(TextExpressions.blocklistMatches(col("text"), big)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    require(sn == refCount,
      s"native ($sn) != JVM contains reference ($refCount) at ${big.size} terms on sample")
    println(f"[blk] ${big.size}%5d terms: native $tnBig%.2f s full corpus ($rnBig matches); " +
      f"sample equality vs JVM contains OK ($sn)")
    spark.stop()
  }
}
