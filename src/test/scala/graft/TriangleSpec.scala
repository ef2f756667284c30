package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MetaQueries

/** Pins the degree-oriented triangle enumeration against graphs the
  * fixture DAG doesn't contain: the K4 closed form (every node in 3
  * triangles, cc = 1) and equivalence with an id-ordered brute force on
  * a random graph — the losslessness of the orientation trick.
  */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def und(pairs: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("x", "y")
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .where(col("a") =!= col("b")).distinct()
  }

  /** Brute-force reference: id-ordered 3-way join, one row per triangle. */
  private def bruteTriangles(e: DataFrame): Long =
    e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .count()

  test("K4: four triangles, every node in three, clustering coefficient 1") {
    val k4 = und(for (x <- Seq("p", "q", "r", "s"); y <- Seq("p", "q", "r", "s"); if x < y) yield (x, y))
    val rows = MetaQueries.triangleCore(k4).collect()
    assert(rows.length === 4)
    assert(rows.forall(r => r.getLong(1) == 3 && r.getLong(2) == 3 && r.getDouble(3) == 1.0))
  }

  test("path graph has no triangles and cc is 0 everywhere (NULL only at degree 1)") {
    val path = und(Seq("1" -> "2", "2" -> "3", "3" -> "4"))
    val rows = MetaQueries.triangleCore(path).collect()
    assert(rows.forall(_.getLong(2) == 0))
    assert(rows.count(_.isNullAt(3)) === 2) // the two endpoints, degree 1
  }

  test("degree-oriented count equals the id-ordered brute force on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = und(Seq.fill(400)((f"n${rnd.nextInt(40)}%s", f"n${rnd.nextInt(40)}%s"))).cache()
    val total = MetaQueries.triangleCore(edges).agg(sum("tri")).collect()(0).getLong(0)
    assert(total === 3 * bruteTriangles(edges), "corner counts must be 3x the triangle count")
  }

  /** Brute-force core numbers: the classic sequential peel (remove
    * min-degree nodes at increasing k) — the algorithm the h-index
    * iteration exists to avoid distributing. */
  private def brutePeel(e: DataFrame): Map[String, Long] = {
    val adj = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
    for (r <- e.collect(); (a, b) = (r.getString(0), r.getString(1))) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val core = scala.collection.mutable.Map.empty[String, Long]
    var k = 0
    while (adj.nonEmpty) {
      val peel = adj.collect { case (n, ns) if ns.size <= k => n }.toSeq
      if (peel.isEmpty) k += 1
      else for (n <- peel) {
        core(n) = k.toLong
        adj(n).foreach(m => adj.get(m).foreach(_ -= n))
        adj -= n
      }
    }
    core.toMap
  }

  private def cores(e: DataFrame): Map[String, Long] =
    MetaQueries.corenessCore(e).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("coreness: K4 is a 3-core, a path is a 1-core, a pendant hangs off a 2-core triangle") {
    val k4 = und(for (x <- Seq("p", "q", "r", "s"); y <- Seq("p", "q", "r", "s"); if x < y) yield (x, y))
    assert(cores(k4).values.toSet === Set(3L))
    val path = und(Seq("1" -> "2", "2" -> "3", "3" -> "4"))
    assert(cores(path).values.toSet === Set(1L))
    val triPendant = und(Seq("a" -> "b", "b" -> "c", "a" -> "c", "a" -> "d"))
    assert(cores(triPendant) === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("h-index fixpoint equals the sequential peel on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = und(Seq.fill(300)((f"n${rnd.nextInt(40)}%s", f"n${rnd.nextInt(40)}%s"))).cache()
    assert(cores(edges) === brutePeel(edges))
  }
}
