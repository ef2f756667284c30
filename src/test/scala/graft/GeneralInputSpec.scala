package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextOps}

/** The r7 tokenizer/boundary fixes, pinned on GENERAL input — the
  * driver fixtures are strictly single-space with microsecond-jittered
  * timestamps, so these divergences were invisible to the oracle gate:
  * irregular whitespace and gap-aligned timestamps are exactly what
  * real corpora contain. */
class GeneralInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("quality tokenization ignores empty tokens from leading/trailing/doubled whitespace") {
    val body = Seq.fill(50)("somelongword and the of words").mkString(" ")
    val clean = body
    val messy = "  " + body.replaceFirst(" ", "   ") + " \t"
    val df = Seq((1L, clean), (2L, messy)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val keep = df.select(col("doc_id"),
      TextOps.qualityKeep(col("text"), col("n_chars")).as("k")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // same words => same verdict; n_chars differs slightly but awl
    // stays far inside the band, so any flip would be a token-count bug
    assert(keep(1L) == keep(2L),
      "whitespace shape must not flip the quality verdict")
  }

  test("tokensNonEmpty: array_remove form equals the filter HOF and stays fully codegen'd (r7 verdict #4)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val texts = Seq("  a  b  ", "a b\t", "", " \t ", "\nab\fc", "x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fast = df.select(TextOps.tokensNonEmpty(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    val ref = df.select(filter(split(col("text"), "\\s+"), t => t =!= "").as("t"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    assert(fast == ref, "array_remove must drop exactly the empty tokens the HOF drops")
    // Spark's split keeps BOTH leading and trailing empties (limit −1),
    // so ltrim alone would NOT be equivalent — pin one trailing case
    assert(fast(1) == List("a", "b"))
    // the hot-path form must stay inside whole-stage codegen: no
    // CodegenFallback node (the ArrayFilter HOF is one — per-token
    // interpreted lambda dispatch on every corpus-scan path). Checked
    // on the ANALYZED plan: the Spark 4 Column API builds unresolved
    // nodes (class checks mean nothing pre-analysis), and the OPTIMIZED
    // plan constant-folds a local-relation projection away entirely.
    def fallbacks(c: org.apache.spark.sql.Column) =
      df.select(c).queryExecution.analyzed.expressions
        .flatMap(_.collect { case f: CodegenFallback => f })
    assert(fallbacks(TextOps.tokensNonEmpty(col("text"))).isEmpty,
      "tokensNonEmpty must not contain interpreted expressions")
    assert(fallbacks(filter(split(col("text"), "\\s+"), t => t =!= "")).nonEmpty,
      "sanity: the HOF form is the interpreted one being avoided")
  }

  test("repetition metrics: total and distinct count the SAME tokenization on irregular whitespace (r10 review)") {
    // "a\tb c d": a single-space split sees 3 tokens (total_3grams=1)
    // while the shingle kernel tokenizes all whitespace (4 tokens,
    // 2 distinct 3-grams) — the old mismatch made rep_frac NEGATIVE
    val dir = SparkSuite.tempDir("rep-messy")
    Seq((1L, "en", "a\tb c d"), (2L, "en", " a b c d"), (3L, "en", "w w w w w"))
      .toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("s")).withColumn("ts", current_timestamp())
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.repetitionMetrics(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: 4 ws-tokens -> total 2, distinct 2, rep 0.0
    assert(rows(1L) == ((2L, 2L, 0.0)), s"doc1: ${rows.get(1L)}")
    // doc 2 (leading space): filtered 4 tokens -> total 2 (the
    // unfiltered split said 3 and diverged from the oracle's row set)
    assert(rows(2L) == ((2L, 2L, 0.0)), s"doc2: ${rows.get(2L)}")
    // doc 3: 5 identical tokens -> 3 total, 1 distinct, rep 0.6667
    assert(rows(3L)._1 == 3L && rows(3L)._2 == 1L, s"doc3: ${rows.get(3L)}")
    rows.values.foreach { case (_, _, f) =>
      assert(f >= 0.0 && f <= 1.0, s"rep_frac out of [0,1]: $f") }
  }

  test("mixture sampling at rate 1.0 accepts every doc, including all-f md5 prefixes (r10 review)") {
    // a source small enough for rate = 1.0: the old clamped threshold
    // 'ffffffff' deterministically dropped any doc whose first 8 md5
    // hex chars are all f; 'g' sorts above every hex digit
    val dir = SparkSuite.tempDir("mix-rate1")
    (1L to 10L).map(i => (i, "en", s"doc number $i", s"src"))
      .toDF("doc_id", "lang", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("ts", current_timestamp())
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = TextOps.mixtureSample(spark, dir, quotaPerSource = 40).collect()
    assert(row.length == 1)
    assert(row(0).getDouble(2) == 1.0, s"rate: ${row(0)}")
    assert(row(0).getLong(3) == row(0).getLong(1),
      s"rate 1.0 must sample every doc: ${row(0)}")
  }

  test("string shingles match the hashed kernel on irregular whitespace") {
    val texts = Seq(
      " a b c d",        // leading space
      "a  b c d",        // doubled
      "a b c d \t",      // trailing run
      "a bc d")    // vertical tab: ASCII \\s the kernel now covers
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = df.select(
      size(Dedup.shingles(col("text"), 3)).as("n_str"),
      size(Dedup.hashedShingles(col("text"), 3)).as("n_hash")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getInt(0) == r.getInt(1),
        s"string (${r.getInt(0)}) vs hashed (${r.getInt(1)}) shingle count diverged on '$t'")
    }
    // and both agree the shingle SET is the clean 4-token one
    val clean = df.where(col("doc_id") === 0)
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(clean.toSet == Set("a b c", "b c d"))
  }

  test("session boundary: an event exactly one gap after the last MERGES (break is strictly-greater, both engines)") {
    // pins the verified semantic: Spark session_window merges the
    // gap-aligned event into the running session — matching the
    // oracle's `> INTERVAL 30 MINUTE` break (an r7 review claim of
    // boundary divergence was refuted by this test); one millisecond
    // past the gap DOES split
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t30 = new java.sql.Timestamp(t0.getTime + 30 * 60 * 1000L)      // exactly the gap
    val t30x = new java.sql.Timestamp(t0.getTime + 30 * 60 * 1000L + 1) // 1 ms past
    def nSessions(ts2: java.sql.Timestamp): Long =
      Seq((1L, t0), (1L, ts2)).toDF("user_id", "ts")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .count().count()
    assert(nSessions(t30) == 1, "gap-aligned event must merge (strictly-greater break)")
    assert(nSessions(t30x) == 2, "past-gap event must split")
  }

  test("canonical fingerprint: inner whitespace shape and case never split an exact-dup group") {
    val fps = Seq("a b c", "a  b\tc", "A B C").toDF("text")
      .select(Curation.fingerprint(col("text"))).as[String].collect()
    assert(fps.distinct.length == 1,
      "whitespace-normalized lowercase fingerprint must collapse all three")
  }
}
