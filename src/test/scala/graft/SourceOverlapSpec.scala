package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Bounds the minhash overlap ESTIMATOR against exact Jaccard — the
  * oracle proves both engines compute the same estimate; this spec
  * proves the estimate means what it claims.
  */
class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("identical sources estimate 1.0, disjoint sources estimate 0.0") {
    import spark.implicits._
    val grams = Seq("s1" -> "x y z", "s2" -> "x y z", "s3" -> "p q r")
      .flatMap { case (s, g) => Seq.fill(3)((s, g)) } // duplicates must not matter
      .toDF("source", "g")
    val got = Dedup.sourceOverlapCore(grams)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSet
    assert(got === Set(("s1", "s2", 1.0), ("s1", "s3", 0.0), ("s2", "s3", 0.0)))
  }

  test("estimates track exact Jaccard within 3 sigma + slack on the corpus") {
    val grams = Dedup.sourceGrams(spark, SparkSuite.sfDir).cache()
    val est = Dedup.sourceOverlapCore(grams)
      .select("src_a", "src_b", "est_jaccard")
    val d = grams.distinct().cache()
    val sizes = d.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = d.as("x").join(d.as("y"),
        col("x.g") === col("y.g") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    val exact = inter
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
    // stderr at k=64 is sqrt(J(1-J)/64) <= 0.0625; 3 sigma ~ 0.19
    val offenders = est.join(exact, Seq("src_a", "src_b"), "left")
      .where(abs(col("est_jaccard") - coalesce(col("j"), lit(0.0))) > 0.2)
      .collect()
    grams.unpersist(); d.unpersist()
    assert(offenders.isEmpty,
      s"estimator strayed beyond 3 sigma: ${offenders.mkString(",")}")
  }
}
