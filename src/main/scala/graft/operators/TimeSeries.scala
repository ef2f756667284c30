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
  * Same two-scan economics as [[Vectors.truncTopK]]/PQ, sharpened in
  * r14 to the [[VectorsKmeans]] literal regime: the NQueries-bounded
  * query side is collected once and rendered as integer literals, so
  * BOTH scans are join-free map-side arithmetic over the memoized
  * series (no broadcast builds, no survivor rejoins), and the
  * τ-expansion is tightened by a second-level length-2 segment bound
  * (`lb2 ≤ 2·τ`) evaluated only on survivors of the 6-term `lb ≤ 5·τ`
  * cut (its size is a measurable health signal).
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

  /** Registered entry: the query literals and τ are STATIC derived
    * artifacts of the per-dir corpus snapshot — the [[VectorsIvf]]
    * index discipline: built ONCE per (session, dir, refine) through
    * [[OpMemo]] (the bench's untimed warm pass pays them, with
    * `memo_paid` attribution saying so), then collected per call from
    * the cached model-sized frames (≤ NQueries rows each). Steady
    * state pays only phase 2: one cached-corpus scan and the bounded
    * salted ranks. Static-input contract = OpMemo's (rewriting data
    * under a dir requires `OpMemo.invalidate`, as everywhere). */
  def simSearch(spark: SparkSession, dir: String, refine: Int = Refine): DataFrame = {
    val series = seriesFrame(spark, dir)
    val qFrame = OpMemo.cached(spark, dir, "ts:queries") {
      series.where(col("user_id") < NQueries)
        .select(col("user_id") +: (0 until Days).map(i => col(s"s$i")): _*)
    }
    val qRows = decodeQueries(qFrame.collect().toSeq)
    if (qRows.isEmpty) return emptyResult(series)
    val tauFrame = OpMemo.cached(spark, dir, s"ts:tau:$refine") {
      spark.createDataFrame(tauPhase(series, qRows, refine).toSeq)
        .toDF("query_id", "tau")
    }
    val tauByQ = tauFrame.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rankedResult(series, qRows, tauByQ)
  }

  /** The two-stage search over an INJECTED series frame — the
    * *Core convention of this file family (r12 review: TsScaleProbe
    * carried a verbatim copy of both stages that could silently drift
    * from the operator it claims to measure; it now drives this).
    *
    * r14 shape (verdict #3 asked the τ-expansion tightened below the
    * `lb ≤ 5·τ` cut): the query side is NQueries-bounded BY CONTRACT,
    * so it is collected ONCE and rendered as integer literals — the
    * [[VectorsKmeans]] literal-centroid idiom. That removes every
    * query-side broadcast join, both survivor rejoins, and the
    * union+dedup of the r13 plan: candidate generation, the exact
    * distance, and the expansion cut are all pure map-side integer
    * arithmetic over the memoized series scan, and the whole operator
    * is JOIN-FREE (PlanShapeSpec pins that). τ itself is computed by
    * a small eager phase-1 job (salted rank → K-th exact distance →
    * ≤ NQueries scalars) — the valueRanks bin-offsets discipline: a
    * contract-bounded scalar frame folded driver-side.
    *
    * The expansion is tightened by a SECOND-LEVEL bound on the
    * survivors of the 5·τ cut: length-2 segment sums give
    * `lb2 = Σ₁₅ (S²ₐ−S²ᵦ)² ≤ 2·dist` (same Cauchy–Schwarz), so any
    * true neighbor also satisfies `lb2 ≤ 2·τ`, and the conjunction
    * `lb ≤ 5τ && lb2 ≤ 2τ` is evaluated short-circuit left-to-right —
    * the 15-term refinement only runs on rows that already cleared
    * the 6-term cut, and the exact 30-term pass shrinks to the rows
    * that clear both. Lossless from ANY initial set, as before: the
    * final top-k needs only {dist ≤ τ} ⊆ {lb ≤ 5τ ∧ lb2 ≤ 2τ}, and
    * the expansion set contains the ≥K rows that produced τ. */
  private[graft] def simSearchCore(series: DataFrame, refine: Int = Refine): DataFrame = {
    val qRows = collectQueries(series)
    if (qRows.isEmpty) return emptyResult(series)
    rankedResult(series, qRows, tauPhase(series, qRows, refine))
  }

  private def emptyResult(series: DataFrame): DataFrame =
    series.select(col("user_id").as("query_id"),
      col("user_id").as("neighbor_id"), lit(0L).as("dist")).where(lit(false))

  /** Final top-K over the expansion: the salted two-level rank
    * discipline again — the expansion set is τ-bounded small on
    * structured series, but its size is data-dependent and must not
    * become a per-query funnel. */
  private def rankedResult(series: DataFrame, qRows: Seq[(Long, Array[Long])],
                           tauByQ: Map[Long, Long]): DataFrame =
    expandedFrame(series, qRows, tauByQ)
      .withColumn("srn", row_number().over(wDSalt)).where(col("srn") <= K)
      .withColumn("rn", row_number().over(wD)).where(col("rn") <= K)
      .select("query_id", "neighbor_id", "dist")
      .orderBy("query_id", "dist", "neighbor_id")

  /** Query side, collected once (<= NQueries rows BY CONTRACT — a
    * model-sized side, not a corpus collect). */
  private[graft] def collectQueries(series: DataFrame): Seq[(Long, Array[Long])] =
    decodeQueries(series
      .where(col("user_id") < NQueries)
      .select(col("user_id") +: (0 until Days).map(i => col(s"s$i")): _*)
      .collect().toSeq)

  /** ONE decode for query rows — shared by the memoized-frame path
    * (simSearch) and the injected-frame path (collectQueries), so the
    * two cannot drift (r14 review). Row shape: (user_id, s0..s29). */
  private def decodeQueries(rows: Seq[org.apache.spark.sql.Row]): Seq[(Long, Array[Long])] =
    rows.map(r => r.getLong(0) -> Array.tabulate(Days)(i => r.getLong(i + 1)))
      .sortBy(_._1)

  private def lbOf(qs: Array[Long]): Column = (0 until NSeg).map { j =>
    sq(col(s"g$j") - lit((0 until SegLen).map(i => qs(j * SegLen + i)).sum))
  }.reduce(_ + _)
  private def distOf(qs: Array[Long]): Column =
    (0 until Days).map(i => sq(col(s"s$i") - lit(qs(i)))).reduce(_ + _)
  private def lb2Of(qs: Array[Long]): Column = (0 until Days / 2).map { j =>
    sq(col(s"s${2 * j}") + col(s"s${2 * j + 1}") - lit(qs(2 * j) + qs(2 * j + 1)))
  }.reduce(_ + _)

  // SALTED two-level rank (r13; kept verbatim per r13 verdict #3): a
  // bare per-query row_number window funnels the corpus x Q pair
  // stream into Q single-task sorts — level 1 ranks within
  // (query, salt) as InitSalt-way bounded sorts, level 2 ranks the
  // surviving Q x InitSalt x refine rows (model-sized BY CONSTRUCTION).
  private val InitSalt = 32
  private def wSalt = org.apache.spark.sql.expressions.Window
    .partitionBy(col("query_id"), pmod(col("neighbor_id"), lit(InitSalt)))
    .orderBy(col("lb"), col("neighbor_id"))
  private def wD = org.apache.spark.sql.expressions.Window
    .partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))
  private def wDSalt = org.apache.spark.sql.expressions.Window
    .partitionBy(col("query_id"), pmod(col("neighbor_id"), lit(InitSalt)))
    .orderBy(col("dist"), col("neighbor_id"))

  /** Phase 1 (eager, <= NQueries scalars out): tau = K-th best exact
    * distance among the top-refine lower bounds. The pair stream stays
    * 3 columns wide through both rank shuffles (carrying the 30 day
    * columns measured 10x slower at 1M users); the <= Q x refine
    * survivor ids then broadcast-join the series ONCE for their exact
    * distances — an eager model-sized join that is NOT part of the
    * returned (join-free) plan. Which ids land here is only a
    * tau-quality heuristic — the expansion provably recovers the exact
    * top-k from ANY initial set. */
  private[graft] def tauPhase(series: DataFrame, qRows: Seq[(Long, Array[Long])],
                              refine: Int): Map[Long, Long] = {
    // contract: qRows non-empty — the guarded entry points
    // (simSearch/simSearchCore) return emptyResult before calling here
    require(qRows.nonEmpty, "tauPhase requires a non-empty query set")
    val lbPairs = qRows.map { case (qid, qs) =>
      series.where(col("user_id") =!= qid)
        .select(lit(qid).as("query_id"), col("user_id").as("neighbor_id"),
          lbOf(qs).as("lb"))
    }.reduce(_ unionByName _)
    val distCase = qRows.tail.foldLeft(
      when(col("query_id") === qRows.head._1, distOf(qRows.head._2))) {
      case (acc, (qid, qs)) => acc.when(col("query_id") === qid, distOf(qs))
    }
    // ONE salted rank level, no second-level rank and no rank window
    // over the exact distances (r14: each was a shuffle barrier on the
    // sf0.1 wall): τ only needs the K-th best exact distance among ANY
    // ≥K candidates, and taking ALL ≤ Q×InitSalt×refine salt-level
    // survivors instead of the global top-refine makes τ TIGHTER (more
    // candidates → smaller K-th best), shrinking the expansion. The
    // survivor frame is model-sized BY CONSTRUCTION, so the K-th-best
    // fold runs driver-side on the collected rows — the valueRanks
    // bin-offsets discipline, not a corpus collect.
    val survivors = lbPairs
      .withColumn("srn", row_number().over(wSalt)).where(col("srn") <= refine)
      .select("query_id", "neighbor_id")
    broadcast(survivors)
      .join(series.select(col("user_id").as("neighbor_id") +:
        (0 until Days).map(i => col(s"s$i")): _*), "neighbor_id")
      .select(col("query_id"), distCase.as("dist"))
      .collect()
      .groupBy(_.getLong(0))
      .flatMap { case (qid, rows) =>
        val d = rows.map(_.getLong(1)).sorted
        if (d.length >= K) Some(qid -> d(K - 1)) else None
      }.toMap
  }

  /** Phase 2 (lazy, the returned scan): per-query branch = scan-level
    * conjunctive cut (6-term lb <= 5*tau first, 15-term lb2 <= 2*tau
    * only on its survivors — short-circuit &&), exact 30-term distance
    * computed only on rows that clear both. A query with fewer than K
    * initial survivors has no tau — expand everything, the correct
    * degenerate answer. */
  private[graft] def expandedFrame(series: DataFrame, qRows: Seq[(Long, Array[Long])],
                                   tauByQ: Map[Long, Long]): DataFrame =
    qRows.map { case (qid, qs) =>
      val keep = tauByQ.get(qid) match {
        case Some(t) => (lbOf(qs) <= lit(SegLen.toLong * t)) && (lb2Of(qs) <= lit(2L * t))
        case None => lit(true)
      }
      series.where(col("user_id") =!= qid && keep)
        .select(lit(qid).as("query_id"), col("user_id").as("neighbor_id"),
          distOf(qs).as("dist"))
    }.reduce(_ unionByName _)

  /** Probe hooks (TsPhaseProbe): per-phase timing + the tau-cut health
    * signal (expansion-set size per query). */
  private[graft] def debugTau(series: DataFrame, refine: Int = Refine): Map[Long, Long] = {
    val qRows = collectQueries(series)
    if (qRows.isEmpty) Map.empty else tauPhase(series, qRows, refine)
  }
  private[graft] def debugExpansionSizes(series: DataFrame,
                                         refine: Int = Refine): Map[Long, Long] = {
    val qRows = collectQueries(series)
    if (qRows.isEmpty) return Map.empty
    val tau = tauPhase(series, qRows, refine)
    expandedFrame(series, qRows, tau)
      .groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
