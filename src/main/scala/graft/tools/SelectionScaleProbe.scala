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
  * Round-8 additions (the r7 verdict's rewrite receipts):
  *  3. DSIR STREAMING scorer (stateless aggregate-HOF row map) vs the
  *     batch explode scorer on the same model — the measured
  *     interpreted-HOF price of statelessness (BASELINE note).
  *  4. ccnet terciles: two-phase distributed rank vs the banned
  *     per-lang NTILE window, 1× and 10× — the rank path must
  *     weak-scale while staying bit-identical (spec'd separately).
  *  5. hard negatives: bounded TopKAggregator vs the window
  *     formulation at 10× corpus — the aggregator must not inherit
  *     the window's Q-partition funnel wall.
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

    // --- 3. streaming (rowwise HOF) vs batch (explode) DSIR scoring ----
    // force the SCORES, not a count: a bare count() on the map-only
    // rowwise plan lets column pruning delete the md5/HOF work entirely
    // and times an empty scan
    def forceScores(df: DataFrame): Long =
      df.agg(sum(col("score_micro")) + sum(col("n_bigrams"))).collect()(0).getLong(0)
    val s1 = forceScores(TextSelection.dsirScore(replicated(1), m0)) // warm both paths
    val (_, tb1) = time(forceScores(TextSelection.dsirScore(replicated(1), m0)))
    val r1s = forceScores(TextSelection.dsirScoreRowwise(replicated(1), m0))
    require(r1s == s1, "scorer equivalence (also spec-pinned)")
    val (_, tr1) = time(forceScores(TextSelection.dsirScoreRowwise(replicated(1), m0)))
    val (_, tr10) = time(forceScores(TextSelection.dsirScoreRowwise(replicated(10), m0)))
    println(f"[sel] dsir rowwise: ${tr1}%.2f s vs batch explode ${tb1}%.2f s = " +
      f"${tr1 / tb1}%.2fx interpreted-HOF price; 10x -> ${tr10}%.2f s = ${tr10 / tr1}%.2fx wall")

    // --- 4. ccnet terciles: two-phase rank vs NTILE window, 1x / 10x ---
    // replicas keep each doc's lang so per-lang populations grow 10x —
    // exactly the regime where the lang-only window serializes
    val perdoc1 = graft.operators.TextOps.perplexityFrame(spark, dir).cache()
    perdoc1.count()
    def perdocGrown(k: Int): DataFrame =
      (0 until k).map(i => perdoc1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
    def terciles(df: DataFrame) =
      TextSelection.langTerciles(df).groupBy("lang", "bucket").count().count()
    def tercilesWin(df: DataFrame) =
      TextSelection.langTercilesWindow(df).groupBy("lang", "bucket").count().count()
    val (_, wr) = time(terciles(perdocGrown(1)))
    val (_, r1) = time(terciles(perdocGrown(1)))
    val (_, r10) = time(terciles(perdocGrown(10)))
    val (_, w1) = time(tercilesWin(perdocGrown(1)))
    val (_, w10) = time(tercilesWin(perdocGrown(10)))
    println(f"[sel] ccnet rank  : 1x ${r1}%.2f s (warm $wr%.2f), 10x ${r10}%.2f s = ${r10 / r1}%.2fx wall; " +
      f"NTILE window 1x ${w1}%.2f s, 10x ${w10}%.2f s = ${w10 / w1}%.2fx")

    // --- 4b. tied-logp WHALE: 50% of one lang at a single rounded
    // avg_logp (r9 — the r8 residual). The un-refined rank would sort
    // that whole mass in ONE task; the refined path (boundaryCap low
    // enough to trigger at probe scale) spreads it over doc-id bands.
    // Metric of record: max rows any single rank task sorts, read from
    // the per-task input sizes of the refined vs naive plans' wall
    // time under growth.
    def whaled(k: Int): DataFrame = perdocGrown(k)
      .withColumn("avg_logp",
        when(col("lang") === "en" && col("doc_id") % 2 === 0, lit(-2.7183))
          .otherwise(col("avg_logp")))
    def tercilesCap(df: DataFrame, cap: Long) =
      TextSelection.langTerciles(df, boundaryCap = cap)
        .groupBy("lang", "bucket").count().count()
    tercilesCap(whaled(1), 1000L) // warm
    val (_, wh1) = time(tercilesCap(whaled(1), 1000L))
    val (_, wh10) = time(tercilesCap(whaled(10), 1000L))
    val (_, whNaive1) = time(tercilesCap(whaled(1), Long.MaxValue))
    val (_, whNaive10) = time(tercilesCap(whaled(10), Long.MaxValue))
    println(f"[sel] ccnet whale : refined 1x ${wh1}%.2f s, 10x ${wh10}%.2f s = ${wh10 / wh1}%.2fx wall; " +
      f"single-task bin 1x ${whNaive1}%.2f s, 10x ${whNaive10}%.2f s = ${whNaive10 / whNaive1}%.2fx")

    // --- 5. hard negatives: aggregator vs window at 10x corpus ---------
    // replicas shift vec_id by multiples of 8 past the query range so
    // the Q=8 query set stays fixed while the corpus grows
    def embBig(k: Int): DataFrame = {
      val qs = emb.where(col("vec_id") < 8)
      val rest = (0 until k).map(i => emb.where(col("vec_id") >= 8)
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L * 8)))
        .reduce(_.unionByName(_))
      qs.unionByName(rest)
    }
    val (_, wh) = time(VectorsMining.hardNegativesCore(spark, embBig(1)).count())
    val (h1, th1) = time(VectorsMining.hardNegativesCore(spark, embBig(1)).count())
    val (h10, th10) = time(VectorsMining.hardNegativesCore(spark, embBig(10)).count())
    val (_, thw1) = time(VectorsMining.hardNegativesWindow(embBig(1)).count())
    val (_, thw10) = time(VectorsMining.hardNegativesWindow(embBig(10)).count())
    println(f"[sel] hard-neg agg: 1x $h1 rows ${th1}%.2f s (warm $wh%.2f), 10x $h10 rows " +
      f"${th10}%.2f s = ${th10 / th1}%.2fx wall; window 1x ${thw1}%.2f s, 10x ${thw10}%.2f s = ${thw10 / thw1}%.2fx")
    require(h1 == h10, "Q and k are fixed: output must stay Q*k-sized as the corpus grows")

    // --- 6. margin pairs: target side 10x, queries fixed ---------------
    // embBig keeps ids < 8 fixed and shifts replicas by multiples of 8;
    // even/odd parity is preserved by the 8-multiple shift, so the
    // Q=16 even-id query slice stays fixed while odd targets grow 10x.
    // Write the grown frame out and probe the REGISTERED operator
    // (whose query collect reads vec_id < 32 — unchanged under growth).
    val mDir = java.nio.file.Files.createTempDirectory("margin-probe").toString
    def marginAt(k: Int): (Long, Double) = {
      embGrown(k) // reuse decontam's 10-multiple shift: parity preserved
        .write.mode("overwrite").parquet(s"$mDir/k$k/embeddings.parquet")
      time(VectorsMining.marginPairs.run(spark, s"$mDir/k$k").count())
    }
    val (m1, tm1) = marginAt(1)
    val (m10, tm10) = marginAt(10)
    println(f"[sel] margin pairs: 1x $m1 rows ${tm1}%.2f s, 10x targets -> $m10 rows " +
      f"${tm10}%.2f s = ${tm10 / tm1}%.2fx wall (row-local avg-k, bounded aggs)")

    // --- 7. perceptron: corpus 10x, model traffic fixed ---------------
    // the claim: K iterations = K corpus scans; per-iteration driver
    // traffic stays 256 longs regardless of corpus size. Probe via the
    // registered operator over a written-out replicated corpus.
    val pDir = java.nio.file.Files.createTempDirectory("perceptron-probe").toString
    def perceptronAt(k: Int): Double = {
      replicated(k).write.mode("overwrite").parquet(s"$pDir/k$k/documents.parquet")
      time(graft.operators.TextClassify.perceptron.run(spark, s"$pDir/k$k").count())._2
    }
    val tp1 = perceptronAt(1)
    val tp10 = perceptronAt(10)
    println(f"[sel] perceptron  : 1x ${tp1}%.2f s, 10x corpus -> ${tp10}%.2f s = " +
      f"${tp10 / tp1}%.2fx wall (8 iterations, 256-long model traffic per iteration)")

    spark.stop()
  }
}
