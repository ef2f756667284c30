package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** One-pass sketch signatures for the dedup pipeline.
  *
  * The first formulation computed MinHash as `explode(shingles) →
  * groupBy(doc_id).agg(64 × min(pmod(h·a+b, p)))` and SimHash as
  * `explode(tokens) → 64 × sum(when(bit, 1, -1))` — correct and
  * map-side-combined, but each pays an explode (S× row inflation) and a
  * per-doc shuffle just to reassemble rows that started out together.
  * These expressions compute the whole signature per document in one
  * pass over the already-hashed array: O(64·S) multiply-mods with zero
  * row inflation and zero shuffle — the signature stage becomes a pure
  * map that pipelines into the scan, which is the shape you want when S
  * is hundreds and docs are billions.
  *
  * Arithmetic is IDENTICAL to the aggregate formulation (same (a,b,p)
  * hash family, same `pmod` normalization, same ±1 bit votes), so
  * signatures — and therefore candidate pairs — are bit-for-bit
  * unchanged (asserted in ScaleOpsSpec).
  *
  * `CodegenFallback` as in [[ShingleHashesExpr]]: the per-row loop IS
  * the kernel; expression-dispatch overhead is amortized over 64·S ops.
  */
case class MinHashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression with CodegenFallback {
  require(as.nonEmpty && as.length == bs.length, "coefficient arrays must match")
  private val aArr = as.toArray
  private val bArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sh = v.asInstanceOf[ArrayData].toLongArray()
    val k = aArr.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = java.lang.Math.floorMod(sh(i), p) // == Spark pmod(h, p)
      var j = 0
      while (j < k) {
        val h = (x * aArr(j) + bArr(j)) % p // x < p ≤ 2^32+ε, a < 2^30: no overflow
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash from an array of token hashes: bit j of each token
  * votes ±1 on output bit j; the signature sets bits with positive
  * tallies. Matches `sum(when(shiftright(h, j) & 1 = 1, 1, -1)) > 0`
  * exactly. */
case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData].toLongArray()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = toks(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All L random-hyperplane LSH bucket ids of a float-vector column in
  * one pass: bucket t = (t << b) | sign-bit signature of the b
  * hyperplane dots. Replaces `array(... when(vecDot(v, array(64 lits))
  * > 0, ...) ...)`, which re-evaluated 2048 literal expressions and
  * allocated 32 literal arrays PER ROW; here the planes are plain
  * primitive arrays hoisted out of the loop. Same double-accumulation
  * dot, same bit layout — buckets are bit-for-bit unchanged (asserted
  * in spec). */
case class LshBucketsExpr(child: Expression, planes: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  require(planes.nonEmpty && planes.forall(_.nonEmpty), "planes must be non-empty")
  private val tableBits = planes(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var sig = 0L
      var i = 0
      while (i < table.length) {
        val p = table(i)
        val n = math.min(p.length, arr.length)
        var d = 0.0
        var j = 0
        while (j < n) { d += arr(j).toDouble * p(j).toDouble; j += 1 }
        if (d > 0) sig |= (1L << i)
        i += 1
      }
      out(t) = sig | (t.toLong << tableBits)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Symmetric int8 scalar quantization of a float vector in one pass:
  * q_i = floor(x_i · 127 / max(|x|, 1e-12) + 0.5). Same arithmetic as
  * the HOF formulation in [[graft.operators.Vectors.quantizeInt8Ref]]
  * (equivalence spec'd). */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    var mx = 1e-12
    var i = 0
    while (i < arr.length) {
      val a = math.abs(arr(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Int](arr.length)
    i = 0
    while (i < arr.length) {
      out(i) = math.floor(arr(i).toDouble * 127.0 / mx + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact integer dot of two int arrays (the int8 candidate-scoring
  * kernel). */
case class IntVecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toIntArray()
    val b = r.asInstanceOf[ArrayData].toIntArray()
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i).toLong * b(i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SketchExpressions {
  def lshBuckets(vec: Column, planes: Array[Array[Array[Float]]]): Column =
    ColumnShim.column(LshBucketsExpr(ColumnShim.expression(vec), planes))
  def quantizeInt8(vec: Column): Column =
    ColumnShim.column(QuantizeInt8Expr(ColumnShim.expression(vec)))
  def intVecDot(a: Column, b: Column): Column =
    ColumnShim.column(IntVecDotExpr(ColumnShim.expression(a), ColumnShim.expression(b)))
  def minhashSig(shingleHashes: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnShim.column(MinHashSigExpr(ColumnShim.expression(shingleHashes), as, bs, p))
  def simhashSig(tokenHashes: Column): Column =
    ColumnShim.column(SimHashExpr(ColumnShim.expression(tokenHashes)))
}
