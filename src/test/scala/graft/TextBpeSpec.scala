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

  test("fast trainer matches the hand-computed merge order and stops by itself") {
    import spark.implicits._
    val words = Seq(("aaab", 5L), ("ab", 3L)).toDF("word", "freq")
    val merges = TextBpe.bpeTrainFast(words, numMerges = 8)
    assert(merges === Seq((1, "a", "a", 10L), (2, "a", "b", 8L), (3, "aa", "ab", 5L)))
  }

  test("fast trainer ≡ distributed trainer on the real corpus, 32 merges deep") {
    // the equivalence that lets mergesDf switch to the driver-side
    // delta trainer without touching the oracle: same argmax key
    // (count DESC, l, r UTF-8), same left-to-right fold, 4× past the
    // oracle's 8 merges so a divergence hiding beyond the gated prefix
    // still fails here
    val words = TextBpe.wordFreqs(spark, SparkSuite.sfDir).cache()
    try {
      val fast = TextBpe.bpeTrainFast(words, 32)
      val slow = TextBpe.bpeTrain(words, 32)
      assert(fast === slow)
    } finally words.unpersist()
  }

  test("fast trainer runs O(1) Spark jobs regardless of merge count") {
    // the r5 perf verdict: 2 jobs/merge × 32k merges is ~10⁴ s of pure
    // scheduling. The fast path's job bill is the single vocabulary
    // collect — assert it stays flat at 256 merges (vs ~512 for the
    // distributed loop).
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = TextBpe.bpeTrainFast(TextBpe.wordFreqs(spark, SparkSuite.sfDir), 256)
      // sf0.001's vocabulary fully merges at ~89 ranks — still 20×
      // past the oracle's 8 and far past where the distributed loop's
      // 2-jobs-per-merge bill would show (≥178 jobs)
      assert(merges.size > 64, s"corpus exhausted at ${merges.size} merges — probe too small")
      // listener delivery is async; a short bounded wait is enough for
      // the job-START events of jobs that have already finished
      Thread.sleep(2000)
      assert(jobs.get() <= 4, s"fast BPE ran ${jobs.get()} jobs for 256 merges — not O(1)")
    } finally spark.sparkContext.removeSparkListener(listener)
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

  test("merge exhaustion: both trainers stop early and keep the segmentation (r10 review)") {
    import spark.implicits._
    // one two-char word: exactly ONE merge exists; asking for 4 must
    // yield 1 and leave the vocabulary intact (the oracle CTE chain
    // mirrors this with its LEFT JOIN pass-through)
    val words = Seq(("ab", 5L)).toDF("word", "freq")
    val fast = TextBpe.bpeTrainFast(words, numMerges = 4)
    val dist = TextBpe.bpeTrain(words, numMerges = 4)
    assert(fast == Seq((1, "a", "b", 5L)), s"fast: $fast")
    assert(dist == Seq((1, "a", "b", 5L)), s"dist: $dist")
  }

  test("bpeTrain releases each iteration's checkpoint blocks eagerly (r10 review)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    TextBpe.bpeTrain(Seq(("abab", 4L), ("abba", 3L), ("baba", 2L)).toDF("word", "freq"),
      numMerges = 4)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"localCheckpoint blocks must be freed eagerly, leaked RDD ids: $leaked")
  }

  test("bounded-vocab contract: the collect is capped and the defaults are a fixture no-op") {
    import spark.implicits._
    // a vocabulary larger than the cap: the trainer sees only the
    // maxVocab most frequent words (freq DESC, word ASC) — merges from
    // the dropped tail are impossible
    val words = ((0 until 200).map(i => (f"tail$i%03d", 1L)) :+ ("abab", 100L) :+ ("abac", 90L))
      .toDF("word", "freq")
    val capped = TextBpe.bpeTrainFast(words, numMerges = 4, minCount = 1L, maxVocab = 2)
    // only the two frequent words survive the cap: first merge (a,b) 3
    // occurrences; tail words' single-letter pairs never counted
    assert(capped.nonEmpty && capped.head._2 == "a" && capped.head._3 == "b" &&
      capped.head._4 == 290L, s"capped trainer saw tail words: $capped")
    // minCount floor: freq-1 words drop, the frequent pair count is unchanged
    val floored = TextBpe.bpeTrainFast(words, numMerges = 1, minCount = 2L, maxVocab = 2000000)
    assert(floored.head._4 == 290L, s"floor changed the frequent-pair count: $floored")
    // defaults are a no-op on the gated fixture path: same merges as an
    // explicitly-unbounded run (the oracle-hash-unchanged guarantee)
    val real = TextBpe.wordFreqs(spark, SparkSuite.sfDir)
    val a = TextBpe.bpeTrainFast(real, numMerges = 8)
    val b = TextBpe.bpeTrainFast(real, numMerges = 8, minCount = 1L, maxVocab = Int.MaxValue)
    assert(a == b, "default cap altered fixture training")
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
