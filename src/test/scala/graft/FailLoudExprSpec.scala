package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{MinLongSqDist, SparseCountDot, VectorExpressions}

/** Pins the fail-loud contracts the r11 ADVICE pass added to the two
  * native integer-vector expressions (and the corpus-size guard on the
  * guaranteed-recall band layout):
  *
  *  - [[SparseCountDot]]: a feature id outside the weight table THROWS
  *    instead of silently reading out-of-bounds UnsafeArrayData heap
  *    memory (getLong is bounds-unchecked) — in BOTH the interpreted
  *    and the codegen path.
  *  - [[MinLongSqDist]]: a ragged center set or an empty set THROWS
  *    instead of truncating to min(lengths) / returning the
  *    Long.MaxValue sentinel that would corrupt greedy-FPS silently.
  *  - `bandedHammingPairs8` refuses a corpus past its ceiling — the
  *    honest quadratic-class contract is enforced structurally, not
  *    just documented.
  */
class FailLoudExprSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def rootMessage(t: Throwable): String = {
    var cur = t
    val sb = new StringBuilder(Option(cur.getMessage).getOrElse(""))
    while (cur.getCause != null && (cur.getCause ne cur)) {
      cur = cur.getCause
      sb.append(" | ").append(Option(cur.getMessage).getOrElse(""))
    }
    sb.toString
  }

  test("sparse_count_dot: out-of-range feature id throws, interpreted path") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = SparseCountDot(Literal(1), Literal(1)) // children unused by nullSafeEval
    val weights = ArrayData.toArrayData(Array.fill(4)(1L))
    // in-range works
    val ok = new GenericArrayData(Array[Any](InternalRow(3, 2L)))
    assert(e.nullSafeEval(ok, weights) == 2L)
    // out-of-range (4 >= 4) and negative both throw
    for (bad <- Seq(4, -1)) {
      val fs = new GenericArrayData(Array[Any](InternalRow(bad, 2L)))
      val ex = intercept[IllegalArgumentException](e.nullSafeEval(fs, weights))
      assert(ex.getMessage.contains("sparse_count_dot"), ex.getMessage)
    }
  }

  test("sparse_count_dot: out-of-range feature id throws, codegen path") {
    import spark.implicits._
    val df = Seq((Seq((9, 2L)), Seq(1L, 1L, 1L, 1L))).toDF("fs", "w")
    val ex = intercept[Throwable] {
      df.select(VectorExpressions.sparseCountDot(col("fs"), col("w"))).collect()
    }
    assert(rootMessage(ex).contains("sparse_count_dot"), rootMessage(ex))
  }

  test("min_sqdist: dimension mismatch and empty center set throw; equal dims still exact") {
    import spark.implicits._
    // exact on well-formed input (codegen path)
    val good = Seq((Seq(1L, 2L), Seq(Seq(1L, 5L), Seq(4L, 6L))))
      .toDF("v", "set")
      .select(VectorExpressions.minLongSqDist(col("v"), col("set")))
      .head().getLong(0)
    assert(good == 9L) // min((0+9), (9+16)) = 9
    // ragged center set throws (codegen path)
    val ragged = Seq((Seq(1L, 2L), Seq(Seq(1L, 5L, 7L)))).toDF("v", "set")
    val ex1 = intercept[Throwable] {
      ragged.select(VectorExpressions.minLongSqDist(col("v"), col("set"))).collect()
    }
    assert(rootMessage(ex1).contains("min_sqdist"), rootMessage(ex1))
    // empty set throws (interpreted path, called directly)
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = MinLongSqDist(Literal(1), Literal(1))
    val v = ArrayData.toArrayData(Array(1L, 2L))
    val empty = new GenericArrayData(Array.empty[Any])
    val ex2 = intercept[IllegalArgumentException](e.nullSafeEval(v, empty))
    assert(ex2.getMessage.contains("empty center set"))
    // ragged also throws interpreted
    val raggedSet = new GenericArrayData(Array[Any](ArrayData.toArrayData(Array(1L))))
    val ex3 = intercept[IllegalArgumentException](e.nullSafeEval(v, raggedSet))
    assert(ex3.getMessage.contains("dimension mismatch"))
  }

  test("bandedHammingPairs8: corpus past the ceiling is REFUSED, not silently quadratic") {
    import spark.implicits._
    val df = (0L until 10L).map(i => (i, i, i)).toDF("doc_id", "hi", "lo")
    // under the ceiling: runs
    assert(graft.operators.Multimodal.bandedHammingPairs8(df, maxHamming = 7).count() >= 0)
    // over an explicit tiny ceiling: refuses with the honest-contract message
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Multimodal.bandedHammingPairs8(df, maxHamming = 7, corpusCeiling = 5L)
    }
    assert(ex.getMessage.contains("guaranteed-recall 8x8 banding refused"), ex.getMessage)
    assert(ex.getMessage.contains("n^2/512"), ex.getMessage)
  }
}
