package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextBpe

/** Pins the BPE training semantics the oracle can't see directly: the
  * greedy left-to-right fold (overlap handling, the exact merge order
  * on a hand-computed vocabulary) and the structural invariants of the
  * learned table — so a refactor of the fold expression can't silently
  * drift while the 8-merge oracle still happens to agree.
  */
class TextBpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("greedy left-to-right merge order on a hand-computed vocabulary") {
    import spark.implicits._
    // aaab×5, ab×3: (a,a) counts 2 occurrences per 'aaab' (overlap counted
    // per adjacent index) = 10 > (a,b) = 8. After merging: 'aa a b' (greedy
    // takes the LEFT overlapping pair) and 'a b'; then (a,b)=8 beats
    // (aa,a)=5; finally (aa,ab)=5. Loop must stop by itself at 3 merges.
    val words = Seq(("aaab", 5L), ("ab", 3L)).toDF("word", "freq")
    val merges = TextBpe.bpeTrain(words, numMerges = 8)
    assert(merges === Seq((1, "a", "a", 10L), (2, "a", "b", 8L), (3, "aa", "ab", 5L)))
  }

  test("argmax pair counts are non-increasing across merge ranks") {
    // merging removes occurrences and any pair it creates is bounded by a
    // pre-merge count, so the running argmax can never rise
    val counts = TextBpe.bpe.run(spark, SparkSuite.sfDir)
      .orderBy("merge_rank").select("pair_count")
      .collect().map(_.getLong(0))
    assert(counts.nonEmpty)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts increased along ranks: ${counts.mkString(",")}")
  }

  test("applied segmentation is lossless: subwords concat back to every word") {
    val seg = TextBpe.segmented(spark, SparkSuite.sfDir)
    val broken = seg
      .where(concat_ws("", col("seq")) =!= col("word") ||
        exists(col("seq"), s => s === lit("")))
      .count()
    assert(broken === 0, "a word failed to round-trip through its BPE segmentation")
  }
}
