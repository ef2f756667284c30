package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.VectorsCoreset

/** Pins the farthest-point-sampling semantics the unrolled oracle
  * checks at the output level: the exact greedy trajectory (vs an
  * independent driver-side replay over the same quantized integers)
  * and the structural k-center properties. */
class VectorsCoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def bruteGreedy(k: Int, exclude: Set[Long] = Set.empty): Seq[(Int, Long, Long)] = {
    import spark.implicits._
    val vs = graft.sources.Tables.embeddings(spark, SparkSuite.sfDir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect()
      .filterNot { case (id, _) => exclude(id) }
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 10000.0 + 0.5).toLong)
      }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = vs.maxBy { case (id, q) => (q.map(x => x * x).sum, -id) }
    var sel = Vector((1, seed._1, 0L))
    var selQ = Vector(seed._2)
    while (sel.size < k) {
      val chosen = sel.map(_._2).toSet
      val (id, mind) = vs.filterNot(v => chosen(v._1))
        .map { case (id, q) => (id, selQ.map(s => d2(q, s)).min) }
        .maxBy { case (id, m) => (m, -id) }
      sel = sel :+ ((sel.size + 1, id, mind))
      selQ = selQ :+ vs.find(_._1 == id).get._2
    }
    sel
  }

  test("distributed greedy trajectory == independent driver-side replay, bit for bit") {
    import spark.implicits._
    val got = VectorsCoreset.coresetDf(spark, SparkSuite.sfDir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == bruteGreedy(VectorsCoreset.K))
  }

  test("curation capstone == greedy replay over exactly the semdedup survivors") {
    import spark.implicits._
    val dropped = graft.operators.VectorsKmeans.semDedup(spark, SparkSuite.sfDir)
      .select("vec_id").as[Long].collect().toSet
    assert(dropped.nonEmpty, "fixture must drop at least one semantic dup or the capstone is vacuous")
    val got = graft.operators.VectorsCuration.curationDf(spark, SparkSuite.sfDir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == bruteGreedy(graft.operators.VectorsCoreset.K, exclude = dropped))
    assert(got.map(_._2).forall(!dropped(_)), "no selected rep may be a dropped duplicate")
  }

  test("k-center structure: K distinct reps, covering radius non-increasing") {
    import spark.implicits._
    val rows = VectorsCoreset.coresetDf(spark, SparkSuite.sfDir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(rows.size == VectorsCoreset.K)
    assert(rows.map(_._2).distinct.size == rows.size, "reps must be distinct")
    assert(rows.head._3 == 0L, "seed has no prior set")
    val radii = rows.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"farthest-point radii must be non-increasing: ${radii.mkString(",")}")
    assert(radii.head > 0L, "fixture must not be degenerate")
  }
}
