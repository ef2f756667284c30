package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorsPca

/** Closes the PCA loop over the distributed gram sums: the d×d
  * covariance the `ns_vec_gram` query emits must power-iterate to a
  * genuine principal axis on the driver (the model-sized step a caller
  * would broadcast back for the projection pass).
  */
class VectorsPcaSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private lazy val cov: Array[Array[Double]] = {
    val rows = VectorsPca.gram.run(spark, SparkSuite.sfDir)
      .select("dim_i", "dim_j", "cov").collect()
    val d = rows.map(_.getInt(0)).max
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c // upper triangle mirrors to a symmetric matrix
    }
    m
  }

  test("power iteration finds a top eigenpair: Cv = λv within rounding noise") {
    val d = cov.length
    val (lambda, v) = VectorsPca.topEigen(cov)
    val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val residual = math.sqrt((0 until d).map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    assert(lambda > 0, "top eigenvalue of a covariance matrix must be positive")
    assert(residual < 1e-6 * lambda, s"||Cv - λv|| = $residual not small vs λ = $lambda")
  }

  test("Rayleigh bound: the top eigenvalue dominates every per-dimension variance") {
    val (lambda, _) = VectorsPca.topEigen(cov)
    val maxVar = cov.indices.map(i => cov(i)(i)).max
    assert(lambda >= maxVar - 1e-9,
      s"λ = $lambda below max diagonal variance $maxVar — not the top eigenpair")
  }

  test("integer power iteration (ns_vec_pca_project's axis) reaches the top of the spectrum") {
    // This corpus's covariance is NEAR-DEGENERATE at the top (random
    // unit vectors: λ1/λ2 ≈ 1.013), so "the" top eigenvector is
    // ill-conditioned and axis alignment is not a meaningful claim —
    // the Rayleigh quotient is: every vector in the near-top subspace
    // scores ≈ λ, and K=24 integer iterations measured 0.987·λ in
    // calibration. Gate at 0.97·λ.
    val d = cov.length
    // replay the operator's exact integer loop: round to micro-units,
    // self-scale to CScale, iterate
    val covI = Array.tabulate(d, d)((i, j) => math.round(cov(i)(j)))
    val cmax = covI.flatten.map(math.abs).max
    val covM = covI.map(_.map(ci =>
      if (ci < 0) -((-ci) * 100000L / cmax) else ci * 100000L / cmax))
    var vi = Array.fill(d)(1000000L)
    for (_ <- 1 to VectorsPca.PowerIters) vi = VectorsPca.powerStep(covM, vi)
    val v = {
      val dv = vi.map(_.toDouble)
      val n = math.sqrt(dv.map(x => x * x).sum)
      dv.map(_ / n)
    }
    val (lambda, _) = VectorsPca.topEigen(cov)
    val rq = (0 until d).map(i => (0 until d).map(j => v(i) * cov(i)(j) * v(j)).sum).sum
    assert(rq > 0.97 * lambda, s"Rayleigh $rq below 0.97·λ ($lambda)")
  }

  test("axis 2: deflation yields a near-orthogonal direction with a smaller Rayleigh quotient") {
    val d = cov.length
    val covI = Array.tabulate(d, d)((i, j) => math.round(cov(i)(j)))
    val cmax = covI.flatten.map(math.abs).max
    val covM = covI.map(_.map(ci =>
      if (ci < 0) -((-ci) * 100000L / cmax) else ci * 100000L / cmax))
    var v1 = Array.fill(d)(1000000L)
    for (_ <- 1 to VectorsPca.PowerIters) v1 = VectorsPca.powerStep(covM, v1)
    val v2 = VectorsPca.deflatedAxis(covM, v1)
    def unit(v: Array[Long]) = {
      val dv = v.map(_.toDouble); val n = math.sqrt(dv.map(x => x * x).sum); dv.map(_ / n)
    }
    val (u1, u2) = (unit(v1), unit(v2))
    val cos = math.abs((0 until d).map(i => u1(i) * u2(i)).sum)
    assert(cos < 0.1, s"axis 2 must be near-orthogonal to axis 1: |cos| = $cos")
    def rq(u: Array[Double]) =
      (0 until d).map(i => (0 until d).map(j => u(i) * cov(i)(j) * u(j)).sum).sum
    val (r1, r2) = (rq(u1), rq(u2))
    assert(r2 > 0 && r2 <= r1 * 1.001, s"RQ order violated: axis1 $r1, axis2 $r2")
  }

  test("pca projection stats: per-label totals cover the corpus and bounds order correctly") {
    val rows = VectorsPca.pcaProject.run(spark, SparkSuite.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "proj_min <= proj_max")
      assert(r.getLong(4) >= r.getLong(1) * r.getLong(2) &&
        r.getLong(4) <= r.getLong(1) * r.getLong(3), "sum inside n*[min, max]")
    }
    val total = rows.map(_.getLong(1)).sum
    val nVec = graft.sources.Tables.embeddings(spark, SparkSuite.sfDir).count()
    assert(total == nVec, s"label groups must cover all $nVec vectors, got $total")
  }
}
