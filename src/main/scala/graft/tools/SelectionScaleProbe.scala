package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{TextSelection, VectorsMining}
import graft.sources.Tables

/** Round-7 weak-scaling probes for the selection/mining families —
  * the repo convention: every new operator family's Scaladoc scale
  * claim gets a measured growth number in BASELINE.md.
  *
  *  1. DSIR, both phases separately: the MODEL pass (256-key aggregate
  *     over the bigram stream, collect is 256 rows regardless of
  *     corpus) and the SCORING pass against a FIXED model (join-free
  *     map + per-doc partial agg). Claim: both ∝ corpus, no
  *     corpus×feature term, model memory O(B).
  *  2. Semantic decontamination: train side 10× against the fixed
  *     eval slice. Claim: one broadcast-probe map pass over train —
  *     linear in train, state = eval-sized.
  *
  * Run: `sbt "runMain graft.tools.SelectionScaleProbe"`
  */
object SelectionScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // --- 1. DSIR phases ------------------------------------------------
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text").cache()
    val base = docs.count()
    def replicated(k: Int): DataFrame =
      (0 until k).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
    val (m0, wWarm) = time(TextSelection.dsirModel(replicated(1)))
    val (_, t1m) = time(TextSelection.dsirModel(replicated(1)))
    val (_, t10m) = time(TextSelection.dsirModel(replicated(10)))
    println(f"[sel] dsir model  : $base docs ${t1m}%.2f s (warm $wWarm%.2f); " +
      f"10x -> ${t10m}%.2f s = ${t10m / t1m}%.2fx wall, model stays ${m0.size} buckets")
    val (c1, t1s) = time(TextSelection.dsirScore(replicated(1), m0).count())
    val (c10, t10s) = time(TextSelection.dsirScore(replicated(10), m0).count())
    println(f"[sel] dsir score  : $c1 docs ${t1s}%.2f s; 10x ($c10) -> ${t10s}%.2f s = " +
      f"${t10s / t1s}%.2fx wall (fixed model)")

    // --- 2. semantic decontam: train x10, eval fixed -------------------
    val emb = Tables.embeddings(spark, dir).cache()
    emb.count()
    def embGrown(k: Int): DataFrame = {
      // replicas shift by multiples of 10 so the %10==7 EVAL slice
      // stays exactly the base slice; only the train side grows
      val evalFixed = emb.where(col("vec_id") % 10 === 7)
      val train = (0 until k).map(i => emb.where(col("vec_id") % 10 =!= 7)
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L * 10)))
        .reduce(_.unionByName(_))
      evalFixed.unionByName(train)
    }
    val (_, wd) = time(VectorsMining.semanticDecontamCore(embGrown(1)).count())
    val (d1, td1) = time(VectorsMining.semanticDecontamCore(embGrown(1)).count())
    val (d10, td10) = time(VectorsMining.semanticDecontamCore(embGrown(10)).count())
    println(f"[sel] sem-decontam: eval rows $d1 over 1x train ${td1}%.2f s (warm $wd%.2f); " +
      f"10x train -> $d10 rows ${td10}%.2f s = ${td10 / td1}%.2fx wall")
    require(d1 == d10, "eval slice must stay fixed while train grows")

    spark.stop()
  }
}
