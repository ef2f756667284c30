package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, MetaQueries, TextClassify}
import graft.sources.Tables

/** Pins the r15 optimization-round rewrites to their pre-rewrite
  * semantics (the "add a focused test when an optimization changes an
  * operator's internals" rule):
  *
  *  - simhash soundness: the expensive independent-signature subtree
  *    (explode + 64-vote aggregate) appears exactly ONCE in the plan
  *    (the former two-aliased-join shape planted it twice), and the
  *    violation set stays empty on the suite corpus;
  *  - perceptron: the fused sentinel-row iteration aggregate returns
  *    the same per-feature updates and misclassified count as the
  *    original two-aggregate formulation;
  *  - margin pairs: the native max_by top-1 orders exactly like the
  *    (margin DESC, yid ASC) rank it replaced, ties and negatives
  *    included;
  *  - DAG family: the memoized registered paths return exactly what
  *    the cache-owning cores return on freshly built fixture frames.
  *
  * Runs under the shared AQE-ON test session — together with the
  * AQE-off bench runs this pins that no operator depends on the
  * SPARK_GRAFT_AQE setting for correctness.
  */
class OptimizationR15Spec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir
  import spark.implicits._

  test("simhash sound: independent 64-vote aggregate subtree appears exactly once; no violations") {
    val df = Dedup.simhashViolations(spark, dir)
    val wideAggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.flatMap(_.collect {
            case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ae
          }).size >= 64 => a
    }
    assert(wideAggs.size == 1,
      s"expected the 64-vote signature aggregate exactly once, found ${wideAggs.size}")
    assert(df.count() == 0L)
  }

  test("perceptron: fused sentinel-row iteration == two-aggregate reference, all 8 iterations") {
    val dv = TextClassify.docVectors(Tables.documents(spark, dir)).cache()
    try {
      var w = Array.fill(256)(0L)
      val refCurve = Seq.newBuilder[(Int, Long, Long)]
      for (t <- 1 to TextClassify.PerceptronIters) {
        val wArr = lit(w.clone())
        val miscl = dv.withColumn("margin",
            graft.functions.VectorExpressions.sparseCountDot(col("fs"), wArr))
          .where(col("y") * col("margin") <= 0)
        // the PRE-r15 reference: separate update aggregate + count
        val upd = miscl.select(col("y"), explode(col("fs")).as("e"))
          .groupBy(col("e.f").as("f"))
          .agg(sum(col("y") * col("e.cnt")).as("u"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val nMiscl = miscl.count()
        refCurve += ((t, nMiscl, upd.values.map(math.abs).sum))
        upd.foreach { case (f, u) => w(f) += u }
      }
      val expected = refCurve.result().map { case (t, n, u) => (t.toLong, n, u) }
      val got = SparkEntry.queries("ns_text_perceptron")(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == expected)
    } finally dv.unpersist()
  }

  test("margin pairs: max_by(struct) top-1 == (margin DESC, yid ASC) rank, ties included") {
    val rows = Seq(
      // qid 1: tie on margin -> lower yid must win
      (1L, 10L, 100L, 500L), (1L, 7L, 90L, 500L), (1L, 99L, 80L, 400L),
      // qid 2: single row
      (2L, 5L, 70L, -3L),
      // qid 3: negative margins, tie again
      (3L, 42L, 60L, -10L), (3L, 41L, 50L, -10L), (3L, 40L, 40L, -20L))
      .toDF("qid", "yid", "cosm", "margin_micro")
    val got = rows.groupBy(col("qid").as("query_id"))
      .agg(max_by(
        struct(col("yid"), col("cosm"), col("margin_micro")),
        struct(col("margin_micro"), (-col("yid")).as("neg_yid"))).as("b"))
      .select(col("query_id"), col("b.yid"), col("b.cosm"), col("b.margin_micro"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 7L, 90L, 500L), (2L, 5L, 70L, -3L), (3L, 41L, 50L, -10L)))
  }

  test("DAG family: memoized registered paths == cache-owning cores on fresh frames") {
    import graft.meta.Fixtures
    val edges = Fixtures.edgesDS(spark)
      .select(col("trigger_uuid").as("src"), col("pipeline_uuid").as("dst"))
      .distinct()
    assert(MetaQueries.dagClosure(spark).collect().toSeq ==
      MetaQueries.dagClosureCore(edges).collect().toSeq)
    assert(MetaQueries.criticalPath(spark).collect().toSeq ==
      MetaQueries.criticalPathCore(edges).collect().toSeq)
    assert(MetaQueries.pageRank(spark).collect().toSeq ==
      MetaQueries.pageRankCore(edges).collect().toSeq)
    val und = Fixtures.edgesDS(spark)
      .where(col("trigger_uuid") =!= col("pipeline_uuid"))
      .select(least(col("trigger_uuid"), col("pipeline_uuid")).as("a"),
        greatest(col("trigger_uuid"), col("pipeline_uuid")).as("b"))
      .distinct()
    assert(SparkEntry.queries("ns_dag_kcore")(spark, dir).collect().toSeq ==
      MetaQueries.corenessCore(und).collect().toSeq)
  }
}
