package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.operators.{TextBpe, TextSafety}

/** Semantic pins for the r8 safety-filtering / tokenizer-metric
  * operators beyond their oracle hash-match. */
class TextSafetySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir
  import spark.implicits._

  private def matchesOf(terms: Seq[String], texts: Seq[String]): Seq[List[String]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .orderBy("id")
      .select(TextExpressions.blocklistMatches(col("text"), terms).as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq

  test("Aho-Corasick walk == naive per-term contains, including fail-link cases") {
    // "babc" shares its prefix path with nothing, but matching it must
    // ALSO surface "ab" and "bc" via failure links — a trie without
    // fail links silently misses interior matches
    val terms = Seq("ab", "babc", "bc").sorted
    val texts = Seq(
      "xbabcx",          // all three, two only via fail links
      "ab",              // exact == pattern
      "bcbcbc",          // repeated: distinct-once
      "",                // empty text
      "zzz",             // no match
      "ba bc",           // phrase boundary: "bc" yes, "babc" no
      "ababab")          // overlapping self-runs
    val fast = matchesOf(terms, texts)
    val ref = texts.map(t => terms.filter(t.contains).toList)
    assert(fast == ref)
  }

  test("multi-byte UTF-8 patterns match as byte substrings") {
    val terms = Seq("héllo", "llo", "wör").sorted
    val texts = Seq("héllo wörld", "hello world", "xöllo", "ll" + "o")
    val fast = matchesOf(terms, texts)
    val ref = texts.map(t => terms.filter(t.contains).toList)
    assert(fast == ref)
  }

  test("blocklists beyond 64 terms: bitset accumulator matches naive contains across word boundaries") {
    // 300 terms — ids land in all five bitset words; the matching ids
    // are chosen to straddle the 64/128/192/256 word boundaries where
    // a wrong shift (the old single-Long bitmask) would alias or drop
    val terms = (0 until 300).map(i => f"term$i%03d").sorted
    val texts = Seq(
      terms.mkString(" "),                           // all 300
      "term063 term064 term065",                     // first word boundary
      "xxterm191yy term192",                         // substring + boundary
      terms(255) + terms(256),                       // concatenated, no space
      "no hits here",
      "")
    val fast = matchesOf(terms, texts)
    val ref = texts.map(t => terms.filter(t.contains).toList)
    assert(fast == ref)
    assert(fast.head.size == 300, "the all-terms text must surface every id")
  }

  test("corpus run is non-degenerate and exercises the prefix-sharing pair") {
    val rows = TextSafety.blocklist.run(spark, dir).collect()
    assert(rows.nonEmpty, "blocklist must flag documents on the test corpus")
    // "value table" can only match where "value" also matches —
    // substring semantics, and the automaton must emit BOTH
    val csvs = rows.map(_.getString(2))
    val withPhrase = csvs.filter(_.contains("value table"))
    assert(withPhrase.nonEmpty, "the two-word phrase must match somewhere")
    withPhrase.foreach(c => assert(c.split(",").contains("value"),
      s"phrase match without its prefix term: $c"))
  }

  test("blocklist plan: pure map + filter — no join, no window, no aggregate before the final order") {
    val p = TextSafety.blocklist.run(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"blocklist scan must not join:\n$p")
    assert(!p.contains("Window"), s"blocklist scan must not window:\n$p")
    assert(!p.contains("HashAggregate"), s"blocklist scan must not aggregate:\n$p")
  }

  test("blocklist is stateless: the same expression streams, replay == batch flag set") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.sources.Tables.documents(spark, dir).select("doc_id", "text")
    val srcDir = SparkSuite.tempDir("blocklist-src")
    docs.coalesce(2).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(srcDir)
    val q = stream
      .select(col("doc_id"),
        TextExpressions.blocklistMatches(col("text"), graft.operators.TextSafety.Terms).as("m"))
      .where(size(col("m")) > 0)
      .select(col("doc_id"), array_join(col("m"), ",").as("terms_csv"))
      .writeStream.format("memory").queryName("blk_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming blocklist did not finish")
    q.stop()
    val streamed = spark.table("blk_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = TextSafety.blocklist.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("perceptron: the batch rule learns — misclassifications fall from everything toward a separating margin") {
    val curve = graft.operators.TextClassify.perceptron.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.map(_._1).toSeq == (1L to 8L), "one curve row per iteration")
    // same tokenization as the operator (space split, DSIR's feature
    // contract) — not the \s+ kernel
    val nDocs = graft.sources.Tables.documents(spark, dir)
      .where(size(split(col("text"), " ")) >= 2).count()
    // iteration 1 runs against w = 0: EVERY featured doc has margin 0
    // and is misclassified
    assert(curve.head._2 == nDocs, s"w0 = 0 must misclassify all $nDocs docs, got ${curve.head._2}")
    // learning: the final error is well below the starting point (the
    // en/non-en bigram distributions are separable enough on this
    // corpus for the linear rule to make real progress)
    assert(curve.last._2 < nDocs / 2,
      s"after 8 iterations errors must at least halve: ${curve.map(_._2).mkString(",")}")
    // every update has mass while errors remain
    curve.foreach { case (_, n, l1) => assert(n == 0 || l1 > 0) }
  }

  test("bpe fertility: ratios bounded below by 1 and language totals cover the corpus token count") {
    val rows = TextBpe.bpeFertility.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0, s"${r.getString(0)}: a word is at least one subword")
      assert(r.getDouble(5) >= 1.0, s"${r.getString(0)}: a subword is at least one char")
      assert(r.getLong(2) <= r.getLong(3), "subwords cannot outnumber chars")
    }
    val totalWords = rows.map(_.getLong(1)).sum
    val corpusTokens = graft.sources.Tables.documents(spark, dir)
      .select(explode(graft.operators.TextOps.tokensNonEmpty(lower(col("text")))))
      .count()
    assert(totalWords == corpusTokens,
      s"fertility word total $totalWords != corpus tokens $corpusTokens (dictionary join dropped words)")
  }
}
