package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate
  * their lambdas INTERPRETED — outside whole-stage codegen — which made
  * the LSH/top-k dot products the bench bottleneck. This expression
  * generates a tight primitive loop instead (and its interpreted
  * fallback is the same loop), keeping the whole similarity pipeline
  * inside codegen.
  *
  * Semantics match the previous formulation and the DuckDB oracle
  * exactly: each float is widened to double, products accumulate
  * left-to-right (`list_sum(list_transform(list_zip(...)))` does the
  * same), so oracle hashes are bit-identical.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVecDot]] variant for a float vector against a DOUBLE array
  * (k-means centroids are quantized-exact means, carried as doubles so
  * they stay bit-identical to the oracle's `list(double)`): float side
  * widened, double side used as-is, left-to-right accumulation — the
  * same arithmetic as the interpreted `zip_with`+`aggregate` form it
  * replaces in the assignment hot path. */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot_fd requires (array<float>, array<double>) inputs, got $l / $r")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVecDot]] variant for two DOUBLE arrays (the random-projection
  * sketches are double vectors): left-to-right accumulation, the same
  * arithmetic as the interpreted `zip_with`+`aggregate` form it
  * replaces in rpTopK's O(N·Q) candidate-scoring hot path — array HOF
  * lambdas evaluate interpreted outside codegen (the repo's measured
  * gotcha), and this is the one place a projected dot runs per
  * (query, corpus) pair. */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot_dd requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two SORTED long arrays (set semantics assumed
  * upstream via `array_distinct` + `sort_array`): single merge pass,
  * no per-row hash-set allocation — replaces
  * `array_intersect/array_union` in the dedup verify stage, which
  * build hash tables per row and dominated the pair-verification cost.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val u = ctx.freshName("u")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        int $i = 0; int $j = 0; int $inter = 0;
        while ($i < $n && $j < $m) {
          long $xi = $a.getLong($i); long $yj = $b.getLong($j);
          if ($xi == $yj) { $inter++; $i++; $j++; }
          else if ($xi < $yj) { $i++; } else { $j++; }
        }
        int $u = $n + $m - $inter;
        ${ev.value} = $u == 0 ? 0.0 : ((double) $inter) / $u;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sparse-count dot against a dense weight vector:
  * Σ weights[f] · cnt over an `array<struct<f:int, cnt:bigint>>`
  * feature column, weights an `array<bigint>` (a constant-folded
  * literal in the perceptron loop). Replaces the interpreted
  * `aggregate(fs, 0, (acc, x) -> acc + element_at(w, f+1) * cnt)`
  * HOF — the repo's measured gotcha: lambda HOFs evaluate OUTSIDE
  * whole-stage codegen, and this fold runs once per doc per training
  * iteration, the slowest row of the bench. Exact BIGINT arithmetic,
  * identical to the HOF form. Out-of-range f throws (a hashed feature
  * id outside the weight table is a caller bug, not data noise). */
case class SparseCountDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: org.apache.spark.sql.types.StructType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _))
        if s.length == 2 && s(0).dataType == org.apache.spark.sql.types.IntegerType &&
           s(1).dataType == org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sparse_count_dot requires (array<struct<int,bigint>>, array<bigint>), got $l / $r")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val fs = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val wn = w.numElements()
    var acc = 0L
    var i = 0
    val n = fs.numElements()
    while (i < n) {
      val s = fs.getStruct(i, 2)
      val f = s.getInt(0)
      // r11 ADVICE: lit(Array[Long]) backs the weight table with
      // UnsafeArrayData, whose getLong is bounds-UNCHECKED — an
      // out-of-range feature id would silently read heap garbage, so
      // the throw documented in the contract must be explicit here.
      if (f < 0 || f >= wn)
        throw new IllegalArgumentException(
          s"sparse_count_dot: feature id $f outside weight table [0, $wn)")
      acc += w.getLong(f) * s.getLong(1)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val f = ctx.freshName("f")
      val wn = ctx.freshName("wn")
      s"""
        int $n = $a.numElements();
        int $wn = $b.numElements();
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          InternalRow $s = $a.getStruct($i, 2);
          int $f = $s.getInt(0);
          if ($f < 0 || $f >= $wn)
            throw new IllegalArgumentException(
              "sparse_count_dot: feature id " + $f + " outside weight table [0, " + $wn + ")");
          $acc += $b.getLong($f) * $s.getLong(1);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Min exact-integer squared L2 distance of a BIGINT coordinate array
  * to a SET of BIGINT vectors (`array<array<bigint>>`, the selected
  * centers as one literal): min_s Σ_i (a[i]−s[i])². Replaces the
  * greedy-FPS round's `least(aggregate(zip_with(...)) per center)` —
  * interpreted HOFs whose inlined per-center literals ALSO forced a
  * fresh codegen compile every round (the perceptron lesson: one
  * array Literal rides the reference table, so the generated source
  * is round-invariant and the janino cache hits). */
case class MinLongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(ArrayType(org.apache.spark.sql.types.LongType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_sqdist requires (array<bigint>, array<array<bigint>>), got $l / $r")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val set = b.asInstanceOf[ArrayData]
    val m = set.numElements()
    // r11 ADVICE: the old min(lengths) truncation and Long.MaxValue
    // empty-set sentinel would corrupt greedy-FPS selection silently
    // on a caller bug; the framework convention is fail-loud.
    if (m == 0)
      throw new IllegalArgumentException("min_sqdist: empty center set")
    var best = Long.MaxValue
    var s = 0
    while (s < m) {
      val c = set.getArray(s)
      val n = v.numElements()
      if (c.numElements() != n)
        throw new IllegalArgumentException(
          s"min_sqdist: dimension mismatch ${c.numElements()} != $n")
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = v.getLong(i) - c.getLong(i)
        acc += d * d
        i += 1
      }
      if (acc < best) best = acc
      s += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val best = ctx.freshName("best")
      val s = ctx.freshName("s"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        int $m = $b.numElements();
        if ($m == 0)
          throw new IllegalArgumentException("min_sqdist: empty center set");
        long $best = Long.MAX_VALUE;
        int $n = $a.numElements();
        for (int $s = 0; $s < $m; $s++) {
          org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($s);
          if ($c.numElements() != $n)
            throw new IllegalArgumentException(
              "min_sqdist: dimension mismatch " + $c.numElements() + " != " + $n);
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $d = $a.getLong($i) - $c.getLong($i);
            $acc += $d * $d;
          }
          if ($acc < $best) $best = $acc;
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[FloatVecDot]]. */
  def vecDot(a: Column, b: Column): Column =
    ColumnShim.column(FloatVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[FloatDoubleVecDot]]. */
  def vecDotFD(a: Column, b: Column): Column =
    ColumnShim.column(FloatDoubleVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[DoubleVecDot]]. */
  def vecDotDD(a: Column, b: Column): Column =
    ColumnShim.column(DoubleVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[JaccardSortedLongs]]. */
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnShim.column(JaccardSortedLongs(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[SparseCountDot]]. */
  def sparseCountDot(fs: Column, weights: Column): Column =
    ColumnShim.column(SparseCountDot(ColumnShim.expression(fs), ColumnShim.expression(weights)))

  /** Column API for [[MinLongSqDist]]. */
  def minLongSqDist(v: Column, set: Column): Column =
    ColumnShim.column(MinLongSqDist(ColumnShim.expression(v), ColumnShim.expression(set)))
}
