package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, VectorsPlanted}

/** Weak-scaling probe for the vector-plane ingest path
  * (`ns_vec_incremental_dups`) — the IvfIngestProbe convention: a
  * FIXED new batch (sf0.01's planted m=4 members) band-probes indexes
  * of growing size (sf0.01's 500 members vs sf0.1's 2,000), and the
  * per-ingest wall must stay ~flat — the asymmetric new×index shape's
  * whole claim is that ingest cost is |batch|-proportional, not
  * index-proportional. Candidate counts are printed so the artifact
  * shows WHY (banded buckets stay shallow; no batch×index blowup).
  *
  * Run: `sbt "runMain graft.tools.VecIngestProbe"`
  */
object VecIngestProbe {
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
    val dir = "/root/testdata/sf0.1"
    def bands(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.banded4x16(df.select("doc_id", "hi", "lo"))
    // fixed new batch: the m=4 members of the FIRST 125 groups (the
    // sf0.01-sized slice of sf0.1's corpus — same vector space as the
    // index at every scale, so sibling relations are intact and the
    // candidate count is meaningful, unlike a cross-dir probe whose
    // disjoint vector spaces would make candidates vanish trivially).
    // Signatures pre-materialized so the probe times the PROBE, not
    // the batch's own hashing.
    val allSig = VectorsPlanted.plantedSig(spark, dir)
    val batchGroups = 125L
    val nw = bands(allSig
      .where(col("doc_id") % 8 === 4 && col("doc_id") < batchGroups * 4 * 8)).cache()
    val nBatch = nw.select("doc_id").distinct().count()
    // index grows 1x -> 4x: members 0..3 of the first 125 groups, then
    // of ALL 500 groups
    for (groups <- Seq(batchGroups, 500L)) {
      val ixSig = allSig
        .where(col("doc_id") % 8 =!= 4 && col("doc_id") < groups * 4 * 8)
      val nIndex = ixSig.count() // also materializes the index memo
      val ix = bands(ixSig)
        .withColumn("band_n", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_val")))
        .where(col("band_n") <= lit(Multimodal.WhaleBandCap))
        .select(col("doc_id").as("idx_id"), col("band_idx"), col("band_val"),
          col("hi").as("i_hi"), col("lo").as("i_lo"))
      val probe = () => nw
        .select(col("doc_id").as("new_id"), col("band_idx"), col("band_val"),
          col("hi").as("n_hi"), col("lo").as("n_lo"))
        .join(ix, Seq("band_idx", "band_val"))
        .select("new_id", "idx_id").distinct()
      val cands = probe().count()
      val (_, w1) = time { probe().count() }
      val (_, w2) = time { probe().count() }
      println(f"[vec-ingest] groups=$groups%d index=$nIndex%d batch=$nBatch%d " +
        f"candidates=$cands%d wall_best2=${math.min(w1, w2)}%.2fs")
    }
    println("[vec-ingest] claim: wall and candidates stay ~flat at 4x index — " +
      "per-ingest cost is |batch|-proportional (asymmetric new x index)")
    spark.stop()
  }
}
