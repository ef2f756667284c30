package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.RecallProbe

/** Hard recall floors on the CLUSTERED fixture (r6 verdict #6): the
  * uniform embeddings table is the documented worst case for
  * RP/truncation (no privileged directions), so its floors sit at the
  * noise level and a real regression could hide under them. The
  * mixture-of-Gaussians fixture is the design regime — floors here are
  * meaningfully above noise and pin the bucketing/codebook logic.
  *
  * Measured (seed=42, n=2000, dim=64, 16 centers; RecallProbe r7):
  * lsh 1.00, ivf 1.00, ivf_kmeans 1.00, trunc16 0.68, rp 0.56,
  * int8 0.64, pq 0.52, ivfpq 0.52. Floors leave slack for fixture
  * regeneration, not for design regressions. The quantization families
  * (int8/pq/ivfpq) read LOWER here than on uniform — within-cluster
  * sims bunch within quantization error, so top-5 membership is
  * tie-decided; documented in BASELINE.md, floor set accordingly.
  */
class RecallFloorsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private lazy val recalls: Map[String, (Double, Int)] = {
    val dir = SparkSuite.tempDir("recall-clustered")
    RecallProbe.writeClusteredFixture(spark, dir)
    RecallProbe.recalls(spark, dir)
  }

  private val floors = Map(
    "lsh" -> 0.9, "ivf" -> 0.9, "ivf_kmeans" -> 0.9,
    "trunc16" -> 0.5, "rp" -> 0.4,
    "int8" -> 0.4, "pq" -> 0.35, "ivfpq" -> 0.35)

  floors.foreach { case (family, floor) =>
    test(s"clustered recall floor: $family >= $floor") {
      val (r, cand) = recalls(family)
      assert(r >= floor, f"$family recall@5 $r%.3f below clustered floor $floor (candidates=$cand)")
    }
  }
}
