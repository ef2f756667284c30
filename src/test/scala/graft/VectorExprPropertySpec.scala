package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Property pins for the two native integer-vector kernels the r12
  * fail-loud pass hardened: the codegen'd expression must agree with
  * an independent driver-side reference on random well-formed input
  * (the StateMachineSpec generator-sampling convention — the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class VectorExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def sample[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("property: sparse_count_dot == driver-side reference on random sparse rows") {
    import spark.implicits._
    val gen = for {
      w <- Gen.listOfN(16, Gen.chooseNum(-1000L, 1000L))
      nf <- Gen.chooseNum(0, 12)
      fs <- Gen.listOfN(nf, for {
        f <- Gen.chooseNum(0, 15)
        c <- Gen.chooseNum(-50L, 50L)
      } yield (f, c))
    } yield (fs, w)
    val cases = scala.collection.mutable.ArrayBuffer.empty[(Seq[(Int, Long)], Seq[Long])]
    sample(gen, 60) { case (fs, w) => cases += ((fs, w)); () }
    val df = cases.toSeq.toDF("fs", "w")
      .select(VectorExpressions.sparseCountDot(col("fs"), col("w")).as("dot"))
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = cases.toSeq.map { case (fs, w) => fs.map { case (f, c) => w(f) * c }.sum }
    assert(got == want)
  }

  test("property: min_sqdist == brute-force min over random equal-dim center sets") {
    import spark.implicits._
    val gen = for {
      d <- Gen.chooseNum(1, 8)
      v <- Gen.listOfN(d, Gen.chooseNum(-500L, 500L))
      m <- Gen.chooseNum(1, 6)
      set <- Gen.listOfN(m, Gen.listOfN(d, Gen.chooseNum(-500L, 500L)))
    } yield (v, set)
    val cases = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], Seq[Seq[Long]])]
    sample(gen, 60) { c => cases += c; () }
    val got = cases.toSeq.toDF("v", "set")
      .select(VectorExpressions.minLongSqDist(col("v"), col("set")).as("d2"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.toSeq.map { case (v, set) =>
      set.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }
    assert(got == want)
  }
}
