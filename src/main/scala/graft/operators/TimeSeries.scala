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
  *    30-term squared Euclidean distance and keeps top-5.
  *
  * Same two-scan economics as [[Vectors.truncTopK]]/PQ: queries
  * broadcast, candidate generation is map-side arithmetic on the
  * sketch columns, only survivor ids rejoin the full series. EVERY
  * quantity is an exact integer (counts, segment sums, squared
  * differences), so both stages are bit-deterministic on both engines
  * with zero float surface — the cleanest oracle contract in the ANN
  * family. Segment size 1 makes the bound exact (`lb = dist`), so the
  * prune degrades losslessly to brute force — the spec corner.
  */
object TimeSeries {

  private val Days = 30
  private val SegLen = 5
  private val NSeg = Days / SegLen
  private val NQueries = 5
  private val Refine = 50
  private val K = 5

  /** (user_id, s0..s29, g0..g5): daily counts + segment sums. */
  private[graft] def seriesFrame(spark: SparkSession, dir: String): DataFrame = {
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

  def simSearch(spark: SparkSession, dir: String, refine: Int = Refine): DataFrame = {
    val series = seriesFrame(spark, dir)
    val q = series.select(
      col("user_id").as("query_id") +:
        (0 until Days).map(i => col(s"s$i").as(s"q$i")) ++:
        (0 until NSeg).map(j => col(s"g$j").as(s"qg$j")): _*)
      .where(col("query_id") < NQueries)
    // stage 1: 6-term integer lower bound on the segment-sum sketch
    val lb = (0 until NSeg).map(j => sq(col(s"g$j") - col(s"qg$j"))).reduce(_ + _)
    val wLb = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("lb"), col("neighbor_id"))
    val survivors = series
      .join(broadcast(q.select(col("query_id") +: (0 until NSeg).map(j => col(s"qg$j")): _*)),
        col("user_id") =!= col("query_id"))
      .select(col("query_id"), col("user_id").as("neighbor_id"), lb.as("lb"))
      .withColumn("lrn", row_number().over(wLb))
      .where(col("lrn") <= refine)
      .select("query_id", "neighbor_id")
    // stage 2: exact 30-term distance on survivors only
    val dist = (0 until Days).map(i => sq(col(s"s$i") - col(s"q$i"))).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))
    survivors
      .join(broadcast(q.select(col("query_id") +: (0 until Days).map(i => col(s"q$i")): _*)),
        "query_id")
      .join(series.select(col("user_id").as("neighbor_id") +:
        (0 until Days).map(i => col(s"s$i")): _*), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), dist.as("dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= K)
      .select("query_id", "neighbor_id", "dist")
      .orderBy("query_id", "dist", "neighbor_id")
  }

  val simSearchQ: GraftQuery = {
    val dayTerms = (0 until Days)
      .map(i => s"CAST(SUM(CASE WHEN d = $i THEN 1 ELSE 0 END) AS BIGINT) AS s$i")
      .mkString(",\n             ")
    val segTerms = (0 until NSeg)
      .map(j => (0 until SegLen).map(i => s"s${j * SegLen + i}").mkString(" + ") + s" AS g$j")
      .mkString(",\n             ")
    val lbExpr = (0 until NSeg)
      .map(j => s"(c.g$j - q.g$j) * (c.g$j - q.g$j)").mkString(" + ")
    val distExpr = (0 until Days)
      .map(i => s"(c.s$i - q.s$i) * (c.s$i - q.s$i)").mkString(" + ")
    GraftQuery.checked("ns_ts_simsearch",
      s"""WITH daily AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
      FROM events
      WHERE date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) >= 0
        AND date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) < $Days),
    counts AS (
      SELECT user_id,
             $dayTerms
      FROM daily GROUP BY user_id),
    series AS (
      SELECT *,
             $segTerms
      FROM counts),
    lbs AS (
      SELECT q.user_id AS query_id, c.user_id AS neighbor_id,
             $lbExpr AS lb,
             $distExpr AS dist
      FROM series q JOIN series c
        ON q.user_id < $NQueries AND c.user_id <> q.user_id),
    pruned AS (
      SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY lb, neighbor_id) AS lrn
      FROM lbs),
    ranked AS (
      SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
      FROM pruned WHERE lrn <= $Refine)
    SELECT query_id, neighbor_id, dist FROM ranked WHERE rn <= $K
    ORDER BY query_id, dist, neighbor_id""")((s, d) => simSearch(s, d))
  }

  val all: Seq[GraftQuery] = Seq(simSearchQ)
}
