package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** RECALL-AS-DATA capstone — the measurement the planted fixtures
  * exist for, registered as an operator instead of living only in
  * specs: one report row per perceptual plane (image dHash, audio
  * fingerprint, video shingles, embedding SimHash) with the planted
  * ground truth (groups, expected within-group pairs), what the
  * plane's REGISTERED pair detector actually found (within-group =
  * recall numerator, cross-group = false-positive count), and recall
  * in exact integer basis points. A data-quality dashboard runs this
  * after every fixture or detector change; a recall regression on ANY
  * plane flips the row — and the driver's hash compare catches it,
  * because the oracle recomputes BOTH sides (ground truth arithmetic
  * AND the full detector replay) from scratch.
  *
  * Composition: the four pair detectors are the registered queries'
  * own plans (their OpMemo'd frames make this report nearly free when
  * run after them); the oracle NESTS the four registered pair oracles
  * as scoped sub-CTEs (DuckDB scopes a `WITH` inside a CTE body to
  * that subquery, so their overlapping internal CTE names don't
  * collide) — five operators behind one hash, the corpus-funnel
  * convention applied to the recall plane.
  *
  * Expected-pair arithmetic: media planes plant groups of 15
  * consecutive doc_ids (5 members per modality); a corpus whose
  * length is not a multiple of 15 ends with a PARTIAL group, so the
  * ground truth is Σ C(members, 2) per group — never groups×10.
  * The vector plane synthesizes exactly [[VectorsPlanted.Members]]
  * members per base. Scale shape: the detectors dominate; the ground
  * truth is one count-per-group aggregate per plane. */
object RecallReport {

  private def planeStats(plane: String, pairs: DataFrame, groupDiv: Long,
                         expected: DataFrame): DataFrame = {
    val classified = pairs.select(
      (expr(s"a_id div $groupDiv") === expr(s"b_id div $groupDiv")).as("same"))
    val found = classified.agg(
      sum(when(col("same"), 1L).otherwise(0L)).as("found_pairs"),
      sum(when(!col("same"), 1L).otherwise(0L)).as("cross_pairs"))
    expected.crossJoin(found)
      .select(lit(plane).as("plane"), col("n_groups"), col("expected_pairs"),
        coalesce(col("found_pairs"), lit(0L)).as("found_pairs"),
        coalesce(col("cross_pairs"), lit(0L)).as("cross_pairs"),
        expr("coalesce(found_pairs, 0) * 10000 div expected_pairs").as("recall_bp"))
  }

  // Expected-pair ground truth, recomputed from parquet on EVERY run
  // (r15 verdict "what's wrong" #2 rolled back the r15 OpMemo here: it
  // cached aggregates over the documents/embeddings BASE tables keyed
  // on the data dir, so the bench row stopped paying the scans that
  // dominate the declared query at scale — over the memo convention's
  // line). The three per-modality documents scans fuse into ONE scan
  // grouped by (doc_id % 3, doc_id div 15) — cheaper than three scans
  // AND honest. Collected eagerly (3 rows, driver-side) because a lazy
  // `WHERE mod = m` above the aggregate gets predicate-pushed below it
  // by Catalyst, re-splitting the plan into three mod-filtered scans —
  // the exact shape the fusion removes.
  private def mediaExpectedByMod(spark: SparkSession, dir: String): Map[Long, (Long, Long)] =
    Tables.documents(spark, dir)
      .groupBy((col("doc_id") % 3).cast("long").as("mod"),
        expr("doc_id div 15").as("grp"))
      .agg(count(lit(1)).as("c"))
      .groupBy("mod")
      .agg(count(lit(1)).as("n_groups"),
        sum(expr("c * (c - 1) div 2")).as("expected_pairs"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  /** 1-row literal frame per modality; an absent mod class mirrors the
    * pre-fusion aggregate-over-empty shape (n_groups 0, null pairs). */
  private def mediaExpected(byMod: Map[Long, (Long, Long)], mod: Int)
                           (implicit spark: SparkSession): DataFrame = {
    val (ng, ep) = byMod.get(mod.toLong)
      .map { case (n, e) => (lit(n), lit(e)) }
      .getOrElse((lit(0L), lit(null).cast("long")))
    spark.range(1).select(ng.as("n_groups"), ep.as("expected_pairs"))
  }

  private def vecExpected(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") % 4 === 0)
      .agg(count(lit(1)).as("n_groups"),
        (count(lit(1)) * (VectorsPlanted.Members * (VectorsPlanted.Members - 1) / 2))
          .as("expected_pairs"))

  private def mediaExpectedSql(mod: Int): String =
    s"""(SELECT COUNT(*) AS n_groups,
            CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS expected_pairs
     FROM (SELECT doc_id // 15 AS grp, COUNT(*) AS c
           FROM documents WHERE doc_id % 3 = $mod GROUP BY 1))"""

  // ONE aggregate subquery per plane (r12 review: three independent
  // scalar subqueries over the same pairs CTE let DuckDB inline — and
  // replay — the full detector pipeline up to 3× per plane, inflating
  // the oracle-side bench the published ratios divide by; this is the
  // Spark side's single-pass planeStats shape mirrored)
  private def planeSql(plane: String, pairsCte: String, groupDiv: Long,
                       expectedSql: String): String =
    s"""SELECT '$plane' AS plane, e.n_groups, e.expected_pairs,
        f.found_pairs, f.cross_pairs,
        f.found_pairs * 10000 // e.expected_pairs AS recall_bp
     FROM $expectedSql e CROSS JOIN (
       SELECT CAST(COALESCE(SUM(CASE WHEN a_id // $groupDiv = b_id // $groupDiv
                                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS found_pairs,
              CAST(COALESCE(SUM(CASE WHEN a_id // $groupDiv <> b_id // $groupDiv
                                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_pairs
       FROM $pairsCte) f"""

  /** Oracle assembled from the four REGISTERED pair oracles — built at
    * init so a pair-oracle change propagates here automatically (no
    * copy to drift). */
  private def oracle: String = {
    val img = Multimodal.phashDups.oracle.get
    val aud = Multimodal.audioDups.oracle.get
    val vid = Multimodal.videoDups.oracle.get
    val vec = VectorsPlanted.plantedDups.oracle.get
    s"""WITH img_pairs AS ($img),
    aud_pairs AS ($aud),
    vid_pairs AS ($vid),
    vec_pairs AS ($vec)
    ${planeSql("audio", "aud_pairs", 15, mediaExpectedSql(1))}
    UNION ALL
    ${planeSql("image", "img_pairs", 15, mediaExpectedSql(0))}
    UNION ALL
    ${planeSql("vector", "vec_pairs", 8,
      """(SELECT COUNT(*) AS n_groups,
              CAST(COUNT(*) * 10 AS BIGINT) AS expected_pairs
          FROM embeddings WHERE vec_id % 4 = 0)""")}
    UNION ALL
    ${planeSql("video", "vid_pairs", 15, mediaExpectedSql(2))}
    ORDER BY plane"""
  }

  val recallReport: GraftQuery = GraftQuery.checked("ns_recall_report", oracle) {
    (spark, dir) =>
      implicit val s: SparkSession = spark
      val byMod = mediaExpectedByMod(spark, dir) // one fused scan per run
      planeStats("audio", Multimodal.audioDups.run(spark, dir), 15,
          mediaExpected(byMod, 1))
        .unionByName(planeStats("image", Multimodal.phashDups.run(spark, dir), 15,
          mediaExpected(byMod, 0)))
        .unionByName(planeStats("vector", VectorsPlanted.plantedDups.run(spark, dir), 8,
          vecExpected(spark, dir)))
        .unionByName(planeStats("video", Multimodal.videoDups.run(spark, dir), 15,
          mediaExpected(byMod, 2)))
        .orderBy("plane")
  }

  val all: Seq[GraftQuery] = Seq(recallReport)
}
