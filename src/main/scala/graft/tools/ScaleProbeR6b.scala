package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{EventCdc, TextClassify}

/** Round-6b weak-scaling probes for the CDC merge and the NB
  * classifier — substantiating their Scaladoc scale claims with
  * measured growth, the repo convention for every new operator
  * family (results → BASELINE.md).
  *
  *  1. CDC merge: a FIXED 2M-event snapshot side, change batches of
  *     200k vs 2M events. Claim: per-load cost ∝ batch (latest-per-key
  *     on the static side is the one fixed term; in production it is
  *     the stored dimension and not recomputed at all — here it is
  *     recomputed per run, so the measured growth UPPER-bounds the
  *     true batch-proportional cost).
  *  2. NB scoring: training frame fixed (the sf0.1 corpus' %5≠0
  *     split, passed explicitly via nbClassifySplit), scoring corpus
  *     1× vs 10× (id-shifted copies of the eval split ONLY). Claim:
  *     scoring is one broadcast-join map pass + per-doc reduce —
  *     linear, no corpus×vocab term.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR6b"`
  */
object ScaleProbeR6b {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def synthEvents(spark: SparkSession, n: Long, users: Long,
                          startDay: Int): DataFrame = {
    // deterministic event stream: id-derived users/types/ts; days
    // offset so snapshot (days < 16) and batch (>= 16) split cleanly
    spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % users).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase"), lit("signup"),
        lit("error")), (col("id") % 5 + 1).cast("int")).as("event_type"),
      timestamp_micros(lit(1704067200000000L) + // 2024-01-01 00:00 UTC
        lit(startDay.toLong * 86400000000L) +
        (col("id") % 864000L) * 1000000L).as("ts"),
      (col("id") % 1000L).as("cents"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- 1. CDC merge: fixed snapshot, growing batch ------------------
    val users = 500000L
    val snapshotSide = synthEvents(spark, 2000000L, users, 0).cache()
    snapshotSide.count()
    def mergeWith(batchN: Long): Long = {
      val batch = synthEvents(spark, batchN, users, 16)
        .withColumn("event_id", col("event_id") + 10000000L)
      EventCdc.cdcMergeCore(snapshotSide.unionByName(batch), "2024-01-16 00:00:00")
        .count()
    }
    val (_, warm) = time(mergeWith(200000L)) // warm JVM/codegen
    val (n1, t1) = time(mergeWith(200000L))
    val (n10, t10) = time(mergeWith(2000000L))
    println(f"cdc_merge: batch 200k -> $n1 rows in $t1%.2f s (warmup $warm%.2f); " +
      f"batch 2M -> $n10 rows in $t10%.2f s; 10x batch in ${t10 / t1}%.2f x wall")

    // --- 2. NB scoring: fixed training, growing corpus ----------------
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").cache()
    val base = docs.count()
    // training frame FIXED (the corpus' %5≠0 split); only the eval
    // side replicates — id shifts are multiples of 5 so every replica
    // keeps its eval residue, and the split is passed explicitly so
    // the training shuffle provably does not grow with the probe
    val trainDocs = docs.where(col("doc_id") % 5 =!= 0)
    val evalDocs = docs.where(col("doc_id") % 5 === 0)
    def evalReplicated(k: Int): DataFrame =
      (0 until k).map(i => evalDocs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
    val (_, w2) = time(TextClassify.nbClassifySplit(trainDocs, evalReplicated(1)).count())
    val (c1, s1) = time(TextClassify.nbClassifySplit(trainDocs, evalReplicated(1)).count())
    val (c10, s10) = time(TextClassify.nbClassifySplit(trainDocs, evalReplicated(10)).count())
    println(f"nb_classify: corpus $base -> $c1 scored in $s1%.2f s (warmup $w2%.2f); " +
      f"10x corpus -> $c10 scored in $s10%.2f s; 10x in ${s10 / s1}%.2f x wall")

    spark.stop()
  }
}
