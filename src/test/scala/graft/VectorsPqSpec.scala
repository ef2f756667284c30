package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Vectors, VectorsPq}

/** Product-quantization ANN: codes are well-formed, the re-rank makes
  * the pipeline exact when rerank covers the corpus (losslessness
  * corner), and the default Rerank recalls most of the true top-k on
  * the fixture (deterministic data ⇒ deterministic recall).
  */
class VectorsPqSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  test("codes: one code per subspace per vector, each a valid codebook id") {
    val books = VectorsPq.trainPq(spark, dir)
    assert(books.length == VectorsPq.M)
    books.foreach { b =>
      assert(b.nonEmpty && b.size <= VectorsPq.Ks)
      assert(b.forall(_._2.length == VectorsPq.SubDim))
    }
    val enc = VectorsPq.encoded(spark, dir, books)
    val nVecs = enc.count()
    (0 until VectorsPq.M).foreach { s =>
      val valid = books(s).map(_._1).toSet
      val codes = enc.select(col(s"c$s")).distinct().collect().map(_.getInt(0)).toSet
      assert(codes.subsetOf(valid), s"subspace $s emitted unknown code(s) ${codes -- valid}")
    }
    assert(nVecs > 0)
  }

  test("rerank >= corpus degrades to the exact brute-force top-k") {
    val full = VectorsPq.pqTopK(spark, dir, rerank = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == brute, "full-rerank PQ must equal the exact top-k, row for row")
  }

  test("ivf-pq with all cells probed and full rerank degrades to the exact top-k") {
    val full = VectorsPq.ivfPqTopK(spark, dir, nProbe = graft.operators.VectorsKmeans.K,
        rerank = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == brute, "all-cells full-rerank IVF-PQ must equal the exact top-k")
  }

  test("ivf-pq candidates are a subset of pq candidates (cells only prune)") {
    // the coarse quantizer may only REMOVE candidates, never rescore:
    // (query, neighbor) -> approx of the cell-filtered ADC stage must
    // be contained, scores identical, in the unfiltered ADC stage
    val books = VectorsPq.trainPq(spark, dir)
    val queries = VectorsPq.collectQueries(spark, dir, VectorsPq.NQueries)
    val pq = VectorsPq.adcScored(spark, dir, books, VectorsPq.adcPerQuery(books, queries))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfpq = VectorsPq.ivfAdcScored(spark, dir, books, queries, graft.operators.VectorsPq.IvfNProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ivfpq.nonEmpty, "cell filter pruned every candidate")
    assert(ivfpq.size < pq.size, "cell filter pruned nothing — probe lists cover all cells")
    val violations = ivfpq.filterNot { case (k, v) => pq.get(k).contains(v) }
    assert(violations.isEmpty,
      s"IVF-PQ candidates not a score-identical subset of PQ: ${violations.take(3).toSeq}")
  }

  test("ivf-pq recall against brute force stays above the probe floor") {
    val ivfpq = VectorsPq.ivfPqTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivfpq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.3, f"IVF-PQ recall collapsed: $recall%.2f")
  }

  test("default Rerank recalls most of the exact top-k on the fixture") {
    val pq = VectorsPq.pqTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, f"PQ recall@k collapsed: $recall%.2f")
  }
}
