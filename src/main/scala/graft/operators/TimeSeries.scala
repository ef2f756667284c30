package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** TIME-SERIES SIMILARITY SEARCH over per-user daily activity — the
  * distributed two-stage top-k search of the retrieved literature
  * (REPOSE ICDE'21 / Odyssey VLDB'23 / EDBT'19 streaming-series
  * search, all: a cheap LOWER-BOUND prune over a summarized
  * representation, then exact distance on survivors only):
  *
  *  - each user's series = 30 daily event counts (exact BIGINTs);
  *  - stage 1 scores every candidate against each query with the
  *    PAA-style SEGMENT-SUM lower bound: for 5-day segments,
  *    Cauchy–Schwarz gives Σ_seg(aᵢ−bᵢ)² ≥ (S_a−S_b)²/5, so
  *    `lb = Σ_segments (S_a−S_b)²` satisfies `lb ≤ 5·dist` — a
  *    6-term integer form of the 30-term distance (5× cheaper scan,
  *    and at rest the 6 segment sums are the small sketch column a
  *    100 TB store would keep hot while full series stay cold);
  *  - stage 2 re-ranks the 50 best lower bounds with the exact
  *    30-term squared Euclidean distance, takes τ = the k-th best
  *    exact distance found, then EXPANDS the refine set with every
  *    candidate whose `lb ≤ 5·τ` — by the bound, any candidate with
  *    `dist ≤ τ` satisfies `lb ≤ 5·dist ≤ 5·τ`, so the final top-k
  *    over the expanded set is PROVABLY the exact top-k (the
  *    lb > kth-best-exact termination test of the cited literature).
  *
  * The τ-expansion is the r12 review fix: the first cut kept a FIXED
  * top-50 by lower bound, which is not sound — 50 decoys can carry
  * smaller lb yet larger dist than a true neighbor, silently dropping
  * it — and its oracle MIRRORED the prune, so the gate proved only
  * engine-equivalence. The oracle is now INDEPENDENT brute force
  * (exact top-k over all pairs): losslessness is what the driver's
  * hash compare checks, every round, on real data.
  *
  * Same two-scan economics as [[Vectors.truncTopK]]/PQ: queries
  * broadcast, candidate generation is map-side arithmetic on the
  * sketch columns, only survivor ids rejoin the full series (the
  * τ-expansion set is |lb ≤ 5τ|-sized — bound-tight for series with
  * segment structure, and its size is a measurable health signal).
  * EVERY quantity is an exact integer (counts, segment sums, squared
  * differences), so both stages are bit-deterministic on both engines
  * with zero float surface. Segment size 1 makes the bound exact
  * (`lb = dist`), so the prune degrades losslessly to brute force —
  * the spec corner.
  */
object TimeSeries {

  private val Days = 30
  private val SegLen = 5
  private val NSeg = Days / SegLen
  private val NQueries = 5
  private val Refine = 50
  private val K = 5

  /** (user_id, s0..s29, g0..g5): daily counts + segment sums.
    * OpMemo'd (r12 review: simSearch references it from four branches
    * — candidates, two query projections, the survivor rejoin — and
    * the differing projections defeat ReuseExchange, so every run paid
    * four fact scans + pivot aggregations; the ns_events_rfm lesson). */
  private[graft] def seriesFrame(spark: SparkSession, dir: String): DataFrame =
    OpMemo.cached(spark, dir, "ts:series") {
      val daily = Tables.events(spark, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).as("d"))
        .where(col("d") >= 0 && col("d") < Days)
      val dayCols = (0 until Days).map(i =>
        sum(when(col("d") === i, 1L).otherwise(0L)).as(s"s$i"))
      val withDays = daily.groupBy("user_id").agg(dayCols.head, dayCols.tail: _*)
      val segCols = (0 until NSeg).map(j =>
        (0 until SegLen).map(i => col(s"s${j * SegLen + i}"))
          .reduce(_ + _).as(s"g$j"))
      withDays.select(col("user_id") +: (0 until Days).map(i => col(s"s$i")) ++: segCols: _*)
    }

  private def sq(c: Column): Column = c * c

  def simSearch(spark: SparkSession, dir: String, refine: Int = Refine): DataFrame =
    simSearchCore(seriesFrame(spark, dir), refine)

  /** The two-stage search over an INJECTED series frame — the
    * *Core convention of this file family (r12 review: TsScaleProbe
    * carried a verbatim copy of both stages that could silently drift
    * from the operator it claims to measure; it now drives this). */
  private[graft] def simSearchCore(series: DataFrame, refine: Int = Refine): DataFrame = {
    val q = series.select(
      col("user_id").as("query_id") +:
        (0 until Days).map(i => col(s"s$i").as(s"q$i")) ++:
        (0 until NSeg).map(j => col(s"g$j").as(s"qg$j")): _*)
      .where(col("query_id") < NQueries)
    // stage 1: 6-term integer lower bound on the segment-sum sketch,
    // for EVERY candidate (map-side arithmetic, no shuffle of series)
    val lb = (0 until NSeg).map(j => sq(col(s"g$j") - col(s"qg$j"))).reduce(_ + _)
    val cand = series
      .join(broadcast(q.select(col("query_id") +: (0 until NSeg).map(j => col(s"qg$j")): _*)),
        col("user_id") =!= col("query_id"))
      .select(col("query_id"), col("user_id").as("neighbor_id"), lb.as("lb"))
    // initial refine set = the `refine` SMALLEST lower bounds per
    // query, via a SALTED two-level rank — NOT a bare per-query
    // row_number window: partitioning the corpus×Q pair stream by
    // query_id alone funnels the whole corpus into Q single-task
    // sorts, the exact WindowExec barrier the vector top-k family
    // removed in r2 (r13; the old plan also computed that window
    // TWICE, once per lrn branch). Level 1 ranks within (query, salt)
    // — InitSalt-way parallel bounded sorts (the knob scales with the
    // cluster); level 2 ranks the surviving Q×InitSalt×refine rows
    // (model-sized BY CONSTRUCTION). The composition selects exactly
    // the global top-refine by (lb, neighbor_id): every global
    // top-refine row is also top-refine within its salt bucket.
    // Which ids land here is anyway only a τ-quality heuristic — the
    // 2b expansion provably recovers the exact top-k from ANY initial
    // set, and the oracle is independent brute force.
    val InitSalt = 32
    val wSalt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), pmod(col("neighbor_id"), lit(InitSalt)))
      .orderBy(col("lb"), col("neighbor_id"))
    val wQ = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("lb"), col("neighbor_id"))
    val initialIds = cand
      .withColumn("srn", row_number().over(wSalt)).where(col("srn") <= refine)
      .withColumn("lrn", row_number().over(wQ)).where(col("lrn") <= refine)
      .select("query_id", "neighbor_id")
    val dist = (0 until Days).map(i => sq(col(s"s$i") - col(s"q$i"))).reduce(_ + _)
    def exactOn(ids: DataFrame): DataFrame = ids
      .join(broadcast(q.select(col("query_id") +: (0 until Days).map(i => col(s"q$i")): _*)),
        "query_id")
      .join(series.select(col("user_id").as("neighbor_id") +:
        (0 until Days).map(i => col(s"s$i")): _*), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), dist.as("dist"))
    // stage 2a: exact distance on the initial refine set; τ = k-th best
    val initial = exactOn(initialIds)
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))
    val tau = initial.withColumn("rn", row_number().over(wD))
      .where(col("rn") === K).select(col("query_id"), col("dist").as("tau"))
    // stage 2b: SOUNDNESS expansion (r12 review — the fixed top-refine
    // prune was lossy): any candidate with dist ≤ τ has lb ≤ 5·dist ≤
    // 5·τ, so refining everything at lb ≤ 5·τ (inclusive: ties at τ
    // matter under the (dist, neighbor_id) order) provably captures
    // the true top-k. A query with fewer than K initial survivors has
    // no τ row — the left join's null expands EVERYTHING, the correct
    // degenerate answer.
    // tau is NQueries-bounded BY CONTRACT (one row per query) — the
    // broadcast is structural, not a fixture-size bet. The final id
    // set is (initial ∪ lb-expansion) DEDUPED before the single exact
    // pass (the initial ids usually also clear the lb cut — a
    // duplicated pair would occupy two rn slots and could push a true
    // neighbor out of the top K).
    val expandedIds = cand
      .join(broadcast(tau), Seq("query_id"), "left")
      .where(col("tau").isNull || col("lb") <= lit(SegLen) * col("tau"))
      .select("query_id", "neighbor_id")
    exactOn(initialIds.unionByName(expandedIds)
        .dropDuplicates("query_id", "neighbor_id"))
      .withColumn("rn", row_number().over(wD))
      .where(col("rn") <= K)
      .select("query_id", "neighbor_id", "dist")
      .orderBy("query_id", "dist", "neighbor_id")
  }

  /** Oracle = INDEPENDENT brute force — exact top-k over ALL pairs,
    * no sketch, no prune (r12 review: the old oracle mirrored the
    * two-stage plan including its then-lossy prune, proving only
    * engine-equivalence; now the driver's hash compare checks the
    * LOSSLESSNESS theorem itself, every round). */
  val simSearchQ: GraftQuery = {
    val dayTerms = (0 until Days)
      .map(i => s"CAST(SUM(CASE WHEN d = $i THEN 1 ELSE 0 END) AS BIGINT) AS s$i")
      .mkString(",\n             ")
    val distExpr = (0 until Days)
      .map(i => s"(c.s$i - q.s$i) * (c.s$i - q.s$i)").mkString(" + ")
    GraftQuery.checked("ns_ts_simsearch",
      s"""WITH daily AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
      FROM events
      WHERE date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) >= 0
        AND date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) < $Days),
    series AS (
      SELECT user_id,
             $dayTerms
      FROM daily GROUP BY user_id),
    dists AS (
      SELECT q.user_id AS query_id, c.user_id AS neighbor_id,
             $distExpr AS dist
      FROM series q JOIN series c
        ON q.user_id < $NQueries AND c.user_id <> q.user_id),
    ranked AS (
      SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
      FROM dists)
    SELECT query_id, neighbor_id, dist FROM ranked WHERE rn <= $K
    ORDER BY query_id, dist, neighbor_id""")((s, d) => simSearch(s, d))
  }

  val all: Seq[GraftQuery] = Seq(simSearchQ)
}
