package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MetaQueries

/** The critical-path contracts the fixture oracle can't isolate:
  * equality with an independent driver-side longest-path replay, the
  * shortest-vs-longest duality against the closure, and the loud
  * cycle throw. */
class CriticalPathSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("sched levels == independent driver-side longest-path replay") {
    val edges = graft.meta.Fixtures.edgesDS(spark)
      .select("trigger_uuid", "pipeline_uuid")
      .collect().map(r => (r.getString(0), r.getString(1))).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val preds = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val memo = scala.collection.mutable.Map.empty[String, Long]
    def lvl(n: String): Long = memo.getOrElseUpdate(n,
      preds.get(n).map(_.map(p => lvl(p) + 1).max).getOrElse(0L))
    val expected = nodes.map(n => n -> lvl(n)).toMap
    val got = MetaQueries.criticalPath(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.max >= 2, "fixture DAG must be at least 3 levels deep or the op is vacuous")
  }

  test("duality: sched level >= every closure shortest distance ending at the node, minus nothing") {
    // the longest path to a node is >= (shortest distance from any
    // root to it) for every root that reaches it
    val closure = MetaQueries.dagClosure(spark)
      .collect().map(r => (r.getString(1), r.getInt(2).toLong))
    val lvls = MetaQueries.criticalPath(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    closure.foreach { case (node, d) =>
      assert(lvls(node) >= d, s"node $node: longest ${lvls(node)} < shortest $d")
    }
  }

  test("a cyclic graph throws loudly instead of emitting a truncated schedule") {
    import spark.implicits._
    val cyclic = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      MetaQueries.criticalPathCore(cyclic, maxIters = 8).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("dagClosure throws on a SHORT cycle too — semi-naive expansion terminates on it (r10 review)") {
    import spark.implicits._
    // diameter 3 << maxDepth 32: the left-anti stops the second lap, so
    // the frontier empties NATURALLY and the old maxDepth guard never
    // fired — the documented throw-on-cycle contract was unimplemented
    // for exactly the graphs it describes
    val cyclic = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      MetaQueries.dagClosureCore(cyclic, maxDepth = 32).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cycle"), e.getMessage)
    // duplicate edges must not duplicate depth-1 closure rows
    val dup = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("src", "dst")
    val rows = MetaQueries.dagClosureCore(dup, maxDepth = 8).collect()
    assert(rows.length == rows.map(r => (r.getString(0), r.getString(1))).distinct.length,
      s"duplicate (root,node) rows from a non-distinct edge list: ${rows.mkString(",")}")
  }
}
