package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticsParts, EventStats, TextSelection}
import graft.sources.Tables

/** Pins the r16 optimization-round rewrites to their pre-rewrite
  * semantics (the "add a focused test when an optimization changes an
  * operator's internals" rule):
  *
  *  - wau / parts_small_qty: the guard-count conditional broadcast
  *    (the `Dedup.simhashViolations` idiom, r15 verdict next-round #5)
  *    returns the same rows on BOTH guard paths — broadcast (count
  *    under cap) and shuffle (cap forced to 0, the 100 TB regime);
  *  - recall_report: the fused single-scan expected-pair ground truth
  *    (one groupBy(doc_id % 3, doc_id div 15) scan replacing the r15
  *    base-table memos, r15 verdict next-round #1b) matches the
  *    per-modality three-scan reference arithmetic.
  *
  * Runs under the shared AQE-ON test session, so correctness is
  * independent of the bench's SPARK_GRAFT_AQE local default.
  */
class OptimizationR16Spec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  test("wau: broadcast guard path == forced-shuffle path (100 TB regime)") {
    val bc = EventStats.wauFrame(spark, dir).collect().toSeq
    val sh = EventStats.wauFrame(spark, dir, broadcastCap = 0L).collect().toSeq
    assert(bc.nonEmpty && bc == sh)
  }

  test("wau: per-user day-set shape == distinct (user, window-day) reference") {
    // the PRE-r16 reference formulation, verbatim
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cal = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val wauDf = ud
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("i"), col("d"))
      .select(col("user_id"), date_add(col("d"), col("i")).as("wd"))
      .distinct()
      .groupBy(col("wd").as("d")).agg(count(lit(1)).as("wau"))
    val expected = cal.join(wauDf, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        graft.functions.dround(col("dau") / (lit(1.0) * col("wau")), 4).as("stickiness"))
      .orderBy("day").collect().toSeq
    val got = EventStats.wauFrame(spark, dir).collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("parts_small_qty: broadcast guard path == forced-shuffle path (100 TB regime)") {
    val bc = AnalyticsParts.smallQtyFrame(spark, dir).collect().toSeq
    val sh = AnalyticsParts.smallQtyFrame(spark, dir, broadcastCap = 0L).collect().toSeq
    assert(bc.nonEmpty && bc == sh)
  }

  test("rfm: chained in-frame quartile ranks == three rank frames joined back on user_id") {
    // the PRE-r16 reference formulation, verbatim
    val base = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_date"), count(lit(1)).as("freq"),
        sum(floor(col("value") * 100 + 0.5)).as("cents"))
    val based = {
      val p = base
      p.crossJoin(broadcast(p.agg(max("last_date").as("max_date"))))
        .select(col("user_id"), datediff(col("max_date"), col("last_date")).as("r_days"),
          col("freq"), col("cents"))
    }
    val n = broadcast(based.agg(count(lit(1)).as("n")))
    def quartile(valueCol: String, binWidth: Long, invert: Boolean) = {
      val q = ceil(lit(4.0) * col("rk") / col("n"))
      EventStats.valueRanks(based.select("user_id", valueCol), valueCol, binWidth)
        .crossJoin(n)
        .select(col("user_id"),
          (if (invert) lit(5) - q else q).cast("long").as(valueCol + "_q"))
    }
    val expected = based.select("user_id", "cents")
      .join(quartile("r_days", 8L, invert = true), Seq("user_id"))
      .join(quartile("freq", 8L, invert = false), Seq("user_id"))
      .join(quartile("cents", EventStats.GiniBinWidth, invert = false), Seq("user_id"))
      .groupBy(col("r_days_q").as("r"), col("freq_q").as("f"), col("cents_q").as("m"))
      .agg(count(lit(1)).as("n_users"), sum("cents").as("seg_cents"))
      .select(concat_ws("-", col("r"), col("f"), col("m")).as("segment"),
        col("n_users"), col("seg_cents"))
      .orderBy("segment").collect().toSeq
    val got = SparkEntry.queries("ns_events_rfm")(spark, dir).collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("lift: basket-set shape == distinct (user, hr, type) stream reference") {
    // the PRE-r16 reference formulation, verbatim
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .distinct()
    val baskets = ut.groupBy("user_id", "hr")
      .agg(sort_array(collect_set("event_type")).as("tset"))
    val nB = broadcast(baskets.agg(count(lit(1)).as("n_baskets")))
    val tc = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(tset, (a, i) ->
          |  transform(slice(tset, i + 2, size(tset)), b -> struct(a AS t_a, b AS t_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.t_a").as("t_a"), col("p.t_b").as("t_b"))
      .agg(count(lit(1)).as("n_ab"))
    val expected = pairs
      .join(broadcast(tc.select(col("event_type").as("t_a"), col("n_t").as("n_a"))), Seq("t_a"))
      .join(broadcast(tc.select(col("event_type").as("t_b"), col("n_t").as("n_b"))), Seq("t_b"))
      .crossJoin(nB)
      .select(col("t_a"), col("t_b"), col("n_ab"),
        graft.functions.dround(col("n_ab") / (lit(1.0) * col("n_baskets")), 4).as("support"),
        graft.functions.dround((lit(1.0) * col("n_ab") * col("n_baskets")) /
          (lit(1.0) * col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy("t_a", "t_b").collect().toSeq
    val got = SparkEntry.queries("ns_events_lift")(spark, dir).collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("dsir: shared memoized bigram plane == direct-docs model+score reference") {
    val docs = Tables.documents(spark, dir)
    val ref = TextSelection.dsirScoreRowwise(docs, TextSelection.dsirModel(docs))
      .orderBy(col("score_micro").desc, col("doc_id")).limit(100)
      .collect().toSeq
    val got = SparkEntry.queries("ns_text_dsir")(spark, dir).collect().toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("recall_report: fused expected-pair scan == per-modality reference arithmetic") {
    val docs = Tables.documents(spark, dir)
    def ref(mod: Int): (Long, Long) = {
      val r = docs.where(col("doc_id") % 3 === mod)
        .groupBy(expr("doc_id div 15").as("grp")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_groups"), sum(expr("c * (c - 1) div 2")).as("ep"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val report = SparkEntry.queries("ns_recall_report")(spark, dir)
      .select("plane", "n_groups", "expected_pairs")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report("image") == ref(0))
    assert(report("audio") == ref(1))
    assert(report("video") == ref(2))
  }
}
