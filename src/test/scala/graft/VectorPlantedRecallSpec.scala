package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, VectorsPlanted}

/** Measured-recall pins for the planted vector-plane dup corpus — the
  * `ns_mm_phash_dups` treatment (r11 verdict missing #1): planted
  * groups with known integer-exact cosine structure, EXACT recall
  * measured (not assumed), margins and fixture headroom pinned so a
  * drift is diagnosed as fixture change, not operator regression. */
class VectorPlantedRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  private lazy val emitted =
    VectorsPlanted.plantedDupPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  test("planted recall is EXACTLY 100%: every within-group pair is emitted") {
    import spark.implicits._
    val bases = graft.sources.Tables.embeddings(spark, dir)
      .where(col("vec_id") % 4 === 0).select("vec_id").as[Long].collect().sorted
    val expected = (for {
      g <- bases
      a <- 0 until VectorsPlanted.Members
      b <- (a + 1) until VectorsPlanted.Members
    } yield (g * 8 + a, g * 8 + b)).toSet
    val got = emitted.filter(_._3).map(t => (t._1, t._2)).toSet
    assert(got == expected,
      s"recall ${got.size}/${expected.size}; missing=${(expected -- got).take(5)} " +
      s"extra=${(got -- expected).take(5)}")
  }

  test("zero cross-group emissions: the 0.995 threshold separates with margin") {
    assert(emitted.forall(_._3),
      s"cross-group pairs emitted: ${emitted.filterNot(_._3).take(5).toSeq}")
  }

  test("margins: within-group cosine >= 0.9995; cross-group max well under threshold") {
    import spark.implicits._
    val vs = VectorsPlanted.plantedVectors(spark, dir)
      .select("doc_id", "v").as[(Long, Array[Int])].collect()
      .map { case (id, v) => id -> v.map(_.toLong) }
    def cos2Num(a: Array[Long], b: Array[Long]): (Long, Long) = {
      var d = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      (d, na * nb) // cosine² = d²/(na·nb), sign via d
    }
    var minWithin = 1.0; var maxCross = -1.0
    for (i <- vs.indices; j <- (i + 1) until vs.length) {
      val (ai, av) = vs(i); val (bj, bv) = vs(j)
      val (d, n2) = cos2Num(av, bv)
      val c = math.signum(d.toDouble) * math.sqrt(d.toDouble * d / n2)
      if (ai / 8 == bj / 8) minWithin = math.min(minWithin, c)
      else maxCross = math.max(maxCross, c)
    }
    assert(minWithin >= 0.9995, f"within-group cosine floor $minWithin%.6f")
    assert(maxCross <= 0.6, f"cross-group cosine ceiling $maxCross%.6f too close to 0.995")
  }

  test("production LSH top-k retrieves every planted sibling (measured recall 1.0)") {
    // the ns_vec_topk_lsh half of the r11 'planted treatment' ask: the
    // PRODUCTION random-hyperplane bucket-join path (lshTopKOver — the
    // exact code the registered query runs, frame-injected) measured
    // on a corpus with KNOWN neighbor structure. Every planted member
    // queries for top-(Members-1); its true nearest neighbors are its
    // group siblings (cosine >= 0.9995 vs <= 0.45 cross), so full
    // recall means the 8-table x 4-bit banding collides near-identical
    // vectors somewhere — a guarantee-adjacent property measured, not
    // assumed.
    import spark.implicits._
    val emb = VectorsPlanted.plantedVectors(spark, dir)
      .select(col("doc_id").as("vec_id"),
        expr("transform(v, x -> CAST(x / 1000.0 AS FLOAT))").as("embedding"))
    val k = VectorsPlanted.Members - 1
    val got = graft.operators.Vectors
      .lshTopKOver(emb, lit(true), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q2, rs) => q2 -> rs.map(_._2).toSet }
    val vs = emb.select("vec_id").as[Long].collect()
    assert(got.size == vs.length, s"every planted vector must emit a top-k row")
    var found = 0; var total = 0
    vs.foreach { id =>
      val sibs = vs.filter(o => o != id && o / 8 == id / 8).toSet
      total += sibs.size
      found += (got.getOrElse(id, Set.empty) & sibs).size
    }
    assert(total > 0 && found == total,
      s"planted LSH top-k recall ${found.toDouble / total} < 1.0 ($found/$total)")
  }

  test("fixture headroom: band buckets <= cap/2 and within-group hamming <= max/2") {
    // the band join whale-caps at 64 while the oracle replays
    // unguarded (the videoIncremental convention) — headroom keeps the
    // divergence theoretical; hamming headroom keeps candidate recall
    // robust to fixture growth
    val sig = VectorsPlanted.plantedSig(spark, dir)
    val maxBucket = sig.select(col("doc_id"),
        posexplode(array(
          col("lo").bitwiseAND(lit(65535L)), shiftright(col("lo"), 16),
          col("hi").bitwiseAND(lit(65535L)), shiftright(col("hi"), 16))))
      .toDF("doc_id", "band_idx", "band_val")
      .groupBy("band_idx", "band_val").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= Multimodal.WhaleBandCap / 2,
      s"band bucket $maxBucket exceeds cap/2 headroom")
    val rows = sig.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var maxHam = 0
    for (i <- rows.indices; j <- (i + 1) until rows.length
         if rows(i)._1 / 8 == rows(j)._1 / 8) {
      val h = java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) +
        java.lang.Long.bitCount(rows(i)._3 ^ rows(j)._3)
      maxHam = math.max(maxHam, h)
    }
    assert(maxHam <= 5, s"within-group hamming $maxHam exceeds half the 10-bit budget")
  }
}
