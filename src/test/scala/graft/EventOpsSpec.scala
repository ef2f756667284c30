package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, EventStats}
import graft.sources.Tables

/** Structural properties of the round-5 event operators that the
  * value-hash oracle can't state: the transition matrix must be
  * row-stochastic, and SCD2 intervals must tile each user's timeline
  * exactly.
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  test("transition matrix is row-stochastic: each src row's probabilities sum to 1") {
    val bad = EventOps.transitions.run(spark, dir)
      .groupBy("src").agg(org.apache.spark.sql.functions.sum("p").as("row_p"))
      .where(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.col("row_p") - 1.0) > 1e-3)
      .collect()
    assert(bad.isEmpty, s"non-stochastic rows (4-digit rounding allows 1e-3): ${bad.mkString(",")}")
  }

  test("scd2 intervals tile the timeline: n_events sums back to each user's event count") {
    import org.apache.spark.sql.functions._
    val fromIntervals = EventOps.scd2.run(spark, dir)
      .groupBy("user_id").agg(sum("n_events").as("n"))
    val fromEvents = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(fromIntervals.except(fromEvents).isEmpty && fromEvents.except(fromIntervals).isEmpty,
      "interval event counts must partition the per-user event stream")
  }

  test("scd2 intervals chain: every non-current valid_to equals the next valid_from") {
    import org.apache.spark.sql.functions._
    val iv = EventOps.scd2.run(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("interval_seq")
    val broken = iv
      .withColumn("next_from", lead("valid_from", 1).over(w))
      .where((col("is_current") && col("next_from").isNotNull) ||
        (!col("is_current") && !(col("valid_to") <=> col("next_from"))))
      .count()
    assert(broken == 0, s"$broken intervals break the valid_to chain")
  }

  test("giniRanks equals the global-window rank for every bin width") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rev = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(200000).toLong))
      .toDF("user_id", "cents")
    val w = org.apache.spark.sql.expressions.Window.orderBy("cents", "user_id")
    val reference = rev.withColumn("rk", row_number().over(w))
    for (width <- Seq(1L, 97L, 16384L, 1000000L)) {
      val got = EventStats.giniRanks(rev, width).select("user_id", "cents", "rk")
      assert(got.except(reference).isEmpty && reference.except(got).isEmpty,
        s"two-phase ranks diverge from the global window at binWidth=$width")
    }
  }

  test("valueRanks memoizes the offsets job per canonical plan (r12 advice: rfm ran it 3x)") {
    import spark.implicits._
    val rev = Seq.tabulate(50)(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("user_id", "cents")
    val before = EventStats.rankMemoSize
    val a = EventStats.giniRanks(rev, 64L).collect().map(_.toString).sorted
    val afterFirst = EventStats.rankMemoSize
    assert(afterFirst == before + 1, "first build must install one offsets entry")
    // SEMANTICALLY the same input (fresh DataFrame object, same plan):
    // must hit the memo, not run another eager offsets job
    val rev2 = Seq.tabulate(50)(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("user_id", "cents")
    val b = EventStats.giniRanks(rev2, 64L).collect().map(_.toString).sorted
    assert(EventStats.rankMemoSize == afterFirst,
      "a semantically-equal frame must reuse the memoized offsets")
    assert(a.toSeq == b.toSeq, "memoized offsets must not change results")
    // a different binWidth is a different key — new entry, same ranks
    EventStats.giniRanks(rev, 128L).collect()
    assert(EventStats.rankMemoSize == afterFirst + 1,
      "binWidth participates in the memo key")
  }

  test("rankOffsetMemo is bounded LRU and session-evictable (r13 ADVICE #3)") {
    import spark.implicits._
    // pre-fix: an unbounded TrieMap strongly keyed on the session —
    // each distinct plan/literal added an entry for JVM lifetime in a
    // long-lived service, with no eviction or invalidation path
    val df = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("user_id", "cents")
    // distinct binWidths mint distinct keys; past the cap the LRU evicts
    (1 to EventStats.RankMemoMax + 8).foreach { i =>
      EventStats.valueRanks(df, "cents", 100000L + i).collect()
    }
    assert(EventStats.rankMemoSize <= EventStats.RankMemoMax,
      s"memo must stay bounded at ${EventStats.RankMemoMax}, read ${EventStats.rankMemoSize}")
    // the invalidation path OpMemo-style callers use on data rewrite
    EventStats.invalidateRankMemo(spark)
    assert(EventStats.rankMemoSize == 0, "invalidate must drop the session's entries")
    // and the operator still ranks correctly through a cold memo
    val r = EventStats.valueRanks(df, "cents", 16384L)
      .orderBy("rk").select("user_id", "rk").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 1L), (3L, 2L), (2L, 3L)),
      s"ties break on user_id, rank dense from 1: ${r.toSeq}")
  }

  test("gini closed-form corners: uniform revenue scores 0, a single whale scores (n-1)/n") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def giniOf(rev: Seq[(Long, Long)]): Double = {
      val ranked = EventStats.giniRanks(rev.toDF("user_id", "cents"))
      val Array(n, tot, s) = ranked
        .agg(count(lit(1)).cast("double"), sum("cents").cast("double"),
          sum(col("rk").cast("decimal(38,0)") * col("cents")).cast("double"))
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
      2.0 * s / (n * tot) - (n + 1.0) / n
    }
    assert(math.abs(giniOf(Seq.tabulate(40)(i => (i.toLong, 500L)))) < 1e-12)
    val whale = (0L, 100000L) +: Seq.tabulate(39)(i => (i + 1L, 0L))
    assert(math.abs(giniOf(whale) - 39.0 / 40.0) < 1e-12)
  }
}
