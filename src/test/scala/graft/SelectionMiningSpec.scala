package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{TextSelection, VectorsMining}
import graft.sources.Tables

/** Semantic pins for the r7 selection/mining operators beyond their
  * oracle hash-match: the properties that make each one mean what its
  * name claims. */
class SelectionMiningSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  test("ccnet buckets: per-lang terciles are balanced and ordered head >= middle >= tail") {
    val rows = TextSelection.ccnetBuckets.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L), s"$lang must have 3 buckets")
      // NTILE balance: sizes differ by at most 1
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      // ordering: head's WORST doc is at least middle's BEST, etc.
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._4 >= lo._5, s"$lang bucket ${hi._2} lo ${hi._4} < bucket ${lo._2} hi ${lo._5}")
      }
    }
  }

  test("ccnet terciles: the two-phase distributed rank equals the NTILE window per document (r7 verdict)") {
    val perdoc = graft.operators.TextOps.perplexityFrame(spark, dir)
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val fast = buckets(TextSelection.langTerciles(perdoc))
    val ref = buckets(TextSelection.langTercilesWindow(perdoc))
    assert(fast.nonEmpty && fast == ref,
      "rank-identity buckets must be bit-identical to NTILE")
  }

  test("ccnet terciles: the WHALE-refined path (boundaryCap=1) is also bit-identical to NTILE, ties included") {
    // boundaryCap=1 forces EVERY boundary bin through the refined
    // (lkey, doc-id band) sub-rank — including its tie-splitting
    // arithmetic, which the default cap never exercises at test SF.
    // Tie-heavy input: half of one lang collapsed onto a single
    // rounded avg_logp (the r8 verdict's whale scenario).
    val perdoc = graft.operators.TextOps.perplexityFrame(spark, dir)
      .withColumn("avg_logp",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("doc_id") % 2 === 0,
          org.apache.spark.sql.functions.lit(-3.1416)).otherwise(
          org.apache.spark.sql.functions.col("avg_logp")))
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val refined = buckets(TextSelection.langTerciles(perdoc, boundaryCap = 1))
    val ref = buckets(TextSelection.langTercilesWindow(perdoc))
    assert(refined.nonEmpty && refined == ref,
      "whale-refined buckets must be bit-identical to NTILE")
  }

  test("hard negatives: bounded-aggregator ranking equals the window formulation (r7 verdict)") {
    val emb = Tables.embeddings(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val fast = rows(VectorsMining.hardNegativesCore(spark, emb))
    val ref = rows(VectorsMining.hardNegativesWindow(emb))
    assert(fast.nonEmpty && fast == ref)
  }

  test("dsir: target-language documents dominate the selection") {
    val sel = TextSelection.dsir.run(spark, dir).collect()
    assert(sel.length == 100)
    val en = sel.count(_.getString(1) == "en")
    val corpusEnFrac = {
      val d = Tables.documents(spark, dir)
      d.where(col("lang") === "en").count().toDouble / d.count()
    }
    // importance weighting must ENRICH the target beyond its base rate
    assert(en.toDouble / sel.length > corpusEnFrac + 0.1,
      s"en fraction ${en / 100.0} must beat corpus base rate $corpusEnFrac")
    // scores sorted descending with doc_id tie-break
    val scores = sel.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("dsir: the stateless row-wise scorer equals the batch explode scorer exactly") {
    val docs = Tables.documents(spark, dir)
    val model = TextSelection.dsirModel(docs)
    val batch = TextSelection.dsirScore(docs, model)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val rowwise = TextSelection.dsirScoreRowwise(docs, model)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(batch.nonEmpty && rowwise == batch)
  }

  test("dsir: streaming selection replays the batch threshold set (static model, stateless map)") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(spark, dir)
    val model = TextSelection.dsirModel(docs)
    val minScore = 0L // "more target-like than not"
    val batchSel = TextSelection.dsirScore(docs, model)
      .where(col("score_micro") >= minScore)
      .collect().map(_.getLong(0)).toSet
    val srcDir = SparkSuite.tempDir("dsir-src")
    docs.select("doc_id", "lang", "text").coalesce(2).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema("doc_id BIGINT, lang STRING, text STRING").parquet(srcDir)
    val q = TextSelection.dsirScoreRowwise(stream, model)
      .where(col("score_micro") >= minScore)
      .writeStream.format("memory").queryName("dsir_sel")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming selection did not finish")
    q.stop()
    val streamed = spark.table("dsir_sel").collect().map(_.getLong(0)).toSet
    assert(streamed == batchSel && batchSel.nonEmpty)
  }

  test("hard negatives: every neighbor has a different label than its query") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = VectorsMining.hardNegatives.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(emb(n) != emb(q), s"neighbor $n shares label with query $q")
      assert(r.getInt(2) == emb(n), "neg_label must be the neighbor's label")
    }
    // exactly 3 per query (enough different-label candidates exist)
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      assert(g.length == 3, s"query $q returned ${g.length} negatives")
    }
  }

  test("margin pairs: sides respected, margins exceed 1, and the winner maximizes margin (replayed)") {
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosm(a: Array[Float], b: Array[Float]): Long = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      // the operator's exact path: dround(s,4)·1e4 rounded — dround is
      // round(s·1e4, 0)/1e4, i.e. scale-0 HALF_UP on the scaled binary
      java.math.BigDecimal.valueOf(s * 10000).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    }
    val qs = emb.keys.filter(id => id % 2 == 0 && id < 32).toSeq.sorted
    val ys = emb.keys.filter(_ % 2 == 1).toSeq.sorted
    val cm = qs.map(q => q -> ys.map(y => y -> cosm(emb(q), emb(y))).toMap).toMap
    val sx = qs.map(q => q -> cm(q).toSeq.sortBy { case (y, c) => (-c, y) }.take(4).map(_._2).sum).toMap
    val sy = ys.map(y => y -> qs.map(q => cm(q)(y)).sorted(Ordering[Long].reverse).take(4).sum).toMap
    def margin(q: Long, y: Long): Long =
      math.floor(cm(q)(y) * 8.0 / (sx(q) + sy(y)) * 1000000).toLong
    val rows = VectorsMining.marginPairs.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, y, c, mm) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(q % 2 == 0 && q < 32 && y % 2 == 1, "sides: even query, odd pair")
      assert(mm > 1000000L, "only ratio-margin > 1 is mined")
      assert(c == cm(q)(y), "winner's cosine must match the replay")
      assert(mm == margin(q, y), "winner's margin must match the replay")
      val bestY = ys.map(yy => (margin(q, yy), yy)).max(Ordering.by((t: (Long, Long)) => (t._1, -t._2)))
      assert((bestY._1, bestY._2) == ((mm, y)), s"winner for $q must maximize margin: $bestY vs ($mm, $y)")
    }
  }

  test("source drift: one row per source, KL non-negative (within per-term floor loss), totals cover the corpus") {
    val rows = TextSelection.sourceDrift.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nSources = Tables.documents(spark, dir).select("source").distinct().count()
    assert(rows.length == nSources)
    // true KL >= 0; each of the 256 quantized terms floors away < 1
    // micro, so the integer sum can undershoot by at most 256 micro
    rows.foreach { case (s, n, kl) =>
      assert(n > 0, s"$s must have bigrams")
      assert(kl >= -256, s"$s kl_micro $kl below the quantization floor bound")
    }
    val total = rows.map(_._2).sum
    val corpusBigrams = Tables.documents(spark, dir)
      .select(size(split(col("text"), " ")).as("k")).where(col("k") >= 2)
      .agg(sum(col("k") - 1)).collect()(0).getLong(0)
    assert(total == corpusBigrams, s"per-source bigram totals $total != corpus $corpusBigrams")
  }

  test("semantic decontam: eval slice probed against train only, one row per eval vector") {
    val rows = VectorsMining.semanticDecontam.run(spark, dir).collect()
    val nEval = Tables.embeddings(spark, dir).where(col("vec_id") % 10 === 7).count()
    assert(rows.length == nEval)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 7, "eval ids are the %10==7 slice")
      assert(r.getLong(1) % 10 != 7, "nearest neighbor must come from the train side")
      assert(math.abs(r.getDouble(2)) <= 1.0001, "cosine of unit vectors")
      assert(r.getBoolean(3) == (r.getDouble(2) >= 0.8))
    }
  }

}
