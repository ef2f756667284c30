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
}
