package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.dround
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline (north-star
  * extension; builder brief): token counting, quality scoring, document
  * fingerprinting, and an n-gram language-ID heuristic.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * higher-order array functions (codegen'd — no UDFs in the hot path),
  * so at 100 TB these are embarrassingly parallel per-row map stages
  * that pipeline into whatever scan/shuffle surrounds them.
  */
object TextOps {

  /** Whitespace tokenization (texts are single-space word sequences;
    * `\s+` keeps it robust to general input). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** NON-EMPTY whitespace tokens — the empty strings a leading or
    * trailing whitespace run leaves in `split` (Spark keeps BOTH ends:
    * limit −1 semantics) removed via `array_remove`, which is fully
    * codegen'd. The tempting `filter(…, t => t =!= "")` form is an
    * `ArrayFilter` higher-order function and evaluates interpreted
    * (CodegenFallback) — per-token lambda dispatch on every corpus-scan
    * path (r8: the r7 correctness fix had put that HOF in the dedup /
    * quality hot paths; this helper keeps the fix with codegen intact,
    * equivalence spec'd on leading/trailing/tab/FF fixtures). */
  def tokensNonEmpty(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  private[graft] val stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  /** The composite-quality scalar from token/stopword counts — ONE
    * Scala definition for [[textStats]] and [[qualityFrame]]. */
  private[graft] def qualityExpr(nTokens: Column, nStop: Column): Column =
    dround(least(lit(1.0), nTokens / 100.0) *
      (lit(1) - nStop.cast("double") / nTokens), 4)

  /** Per-document composite quality, rounded — the [[textStats]]
    * `quality` column as a standalone frame, shared with the
    * keep-best dedup survivor ([[Dedup.keepBest]]) so the two queries
    * cannot drift on the formula. Both engines replay it identically
    * (the textStats oracle is the SQL side of this expression). */
  private[graft] def qualityFrame(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(toks).as("n_tokens"),
        size(filter(toks, w => array_contains(stopArr, w))).as("n_stop"))
      .select(col("doc_id"), qualityExpr(col("n_tokens"), col("n_stop")).as("quality"))
  }

  /** The DuckDB expression of [[qualityFrame]]'s `quality` (over a
    * `documents` row) — interpolate into oracles that rank by it. */
  private[graft] def qualitySql: String =
    s"""ROUND(LEAST(1.0, CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) / 100.0)
        * (1 - CAST(len(list_filter(string_split_regex(text, '\\s+'),
                 w -> w IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
               / len(string_split_regex(text, '\\s+'))), 4)"""

  /** K-style per-document text statistics: token count, stopword ratio,
    * average word length, composite quality score. Mirrors the oracle
    * formula exactly (double math, identical rounding). */
  val textStats: GraftQuery = GraftQuery.checked("ns_text_stats",
    s"""WITH base AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  w -> w IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS INTEGER) AS n_stop
      FROM documents)
    SELECT doc_id, lang, n_tokens,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
           ROUND((CAST(n_chars AS DOUBLE) - n_tokens + 1) / n_tokens, 2) AS avg_word_len,
           ROUND(LEAST(1.0, n_tokens / 100.0) * (1 - CAST(n_stop AS DOUBLE) / n_tokens), 4) AS quality
    FROM base ORDER BY doc_id""") { (spark, dir) =>
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(toks).as("n_tokens"),
        size(filter(toks, w => array_contains(stopArr, w))).as("n_stop"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        dround(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
        dround((col("n_chars").cast("double") - col("n_tokens") + 1) / col("n_tokens"), 2).as("avg_word_len"),
        qualityExpr(col("n_tokens"), col("n_stop")).as("quality"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: whitespace-normalized lowercase MD5 —
    * the exact-dedup key for content-addressed storage. */
  val fingerprint: GraftQuery = GraftQuery.checked("ns_text_fingerprint",
    """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
    FROM documents ORDER BY doc_id""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Curation.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  /** Token counting, two ways: whitespace tokens and a BPE-ish regex
    * segmentation (letters / digits / single non-alphanumeric — the
    * pre-tokenization shape GPT-style BPE vocabularies assume). The
    * pattern uses only constructs RE2 (DuckDB) and java.util.regex
    * agree on. */
  val tokenCounts: GraftQuery = GraftQuery.checked("ns_text_token_counts",
    """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe_tokens
    FROM documents ORDER BY doc_id""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Per-language corpus statistics (north-star K24 companion). */
  val langStats: GraftQuery = GraftQuery.checked("ns_text_lang_stats",
    """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        dround(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("lang")
  }

  /** Function-word language-ID heuristic. Scores each doc's tokens
    * against small per-language profiles (fixed public function-word
    * lists); deterministic, pure column algebra — so the oracle mirrors
    * it exactly: per-language hit counts, argmax with Spark's
    * `greatest`-over-structs tie-break (max hits, then max lang string
    * = ORDER BY hits DESC, lang DESC).
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "that", "with"),
    "de" -> Seq("der", "und", "die", "ist", "das", "mit"),
    "fr" -> Seq("le", "et", "les", "est", "que", "avec"),
    "es" -> Seq("el", "y", "los", "es", "que", "con"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you"))

  val langId: GraftQuery = GraftQuery.checked("ns_text_langid", {
    val scoreRows = langProfiles.map { case (lang, words) =>
      s"""SELECT doc_id, label_lang, '$lang' AS plang,
            CAST(len(list_filter(t, w -> w IN (${words.map("'" + _ + "'").mkString(", ")}))) AS INTEGER) AS hits
          FROM toks"""
    }.mkString("\n      UNION ALL ")
    s"""WITH toks AS (
      SELECT doc_id, lang AS label_lang, string_split_regex(lower(text), '\\s+') AS t
      FROM documents),
    scores AS (
      $scoreRows),
    ranked AS (
      SELECT doc_id, label_lang, plang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang DESC) AS rn
      FROM scores)
    SELECT doc_id, label_lang, plang AS predicted_lang, hits AS score
    FROM ranked WHERE rn = 1 ORDER BY doc_id"""
  }) { (spark, dir) =>
    val toks = tokens(lower(col("text")))
    val scores = langProfiles.map { case (lang, words) =>
      val wordArr = array(words.map(lit): _*)
      struct(size(filter(toks, w => array_contains(wordArr, w))).as("hits"),
        lit(lang).as("lang"))
    }
    // ONE greatest tree (r10 review #5): each score holds an
    // interpreted filter() HOF per language profile, and two
    // independent getField extractions evaluated the whole 10-HOF tree
    // twice per row; referenced-twice non-cheap projections are not
    // re-inlined by CollapseProject, so the struct evaluates once
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("label_lang"),
        greatest(scores: _*).as("best"))
      .select(col("doc_id"), col("label_lang"),
        col("best").getField("lang").as("predicted_lang"),
        col("best").getField("hits").as("score"))
      .orderBy("doc_id")
  }

  /** PII-style redaction: emails → <EMAIL>, digit runs → <NUM> (the
    * scrubbing pass every training corpus gets before tokenization).
    * Pure regexp_replace — codegen'd, pipelines into the scan; the
    * patterns use only RE2/java.util.regex-common constructs. Output
    * keeps an md5 of the redacted text (stable row, no bulk text in
    * the result) plus the redaction counts. */
  val redact: GraftQuery = GraftQuery.checked("ns_text_redact",
    """SELECT doc_id,
           md5(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
               '[0-9]+', '<NUM>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums
    FROM documents ORDER BY doc_id""") { (spark, dir) =>
    val email = Curation.EmailRe // one canonical pattern across modules
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(Curation.redacted(col("text"))).as("redacted_md5"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_nums"))
      .orderBy("doc_id")
  }

  /** Deterministic content-hash sampling: keep a doc iff the last hex
    * digit of md5(text) falls in the accept set (2/16 = 12.5%) —
    * reproducible corpus subsampling that needs no RNG state, no
    * coordination, and survives re-partitioning/re-runs byte-for-byte
    * (what `TABLESAMPLE` can't promise across engines). */
  val hashSample: GraftQuery = GraftQuery.checked("ns_text_sample",
    """SELECT doc_id, lang, n_chars FROM documents
    WHERE substr(md5(text), 32, 1) IN ('0', '1') ORDER BY doc_id""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .where(substring(md5(col("text")), 32, 1).isin("0", "1"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Repetition metrics — the Gopher-style "repetitious document"
    * quality signal: the fraction of a doc's word 3-grams that are
    * duplicates (1 − distinct/total). High values flag boilerplate /
    * degenerate generations before they reach a training mix. Pure
    * per-row column algebra over the one-pass native shingle kernel —
    * no shuffle until the final order. */
  def repetitionMetrics(spark: SparkSession, dir: String): DataFrame = {
    // NON-EMPTY \s+ tokens (r10 review #1): the old single-space split
    // counted "a\tb" as one token while hashedShingles (the distinct
    // side) tokenizes on all whitespace - total and distinct came from
    // DIFFERENT tokenizations, so rep_frac could go negative and the
    // row filter diverged from the oracle's filtered len (the same
    // class the r7 review fixed in qualityFilter; latent on the
    // single-space fixtures)
    val toks = size(tokensNonEmpty(col("text")))
    val total = (toks - 2).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), total.as("total_3grams"),
        size(graft.operators.Dedup.hashedShingles(col("text"), 3)).cast("long")
          .as("distinct_3grams"))
      .where(col("total_3grams") > 0)
      .select(col("doc_id"), col("lang"), col("total_3grams"), col("distinct_3grams"),
        dround(lit(1.0) - col("distinct_3grams") / col("total_3grams"), 4).as("rep_frac"))
      .orderBy("doc_id")
  }

  val repetition: GraftQuery = GraftQuery.checked("ns_text_repetition",
    """WITH t AS (
      SELECT doc_id, lang, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS toks
      FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) - 2 AS BIGINT) AS total_3grams,
           CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
             i -> array_to_string(toks[i:i+2], ' ')))) AS BIGINT) AS distinct_3grams,
           ROUND(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
             i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) / (len(toks) - 2), 4) AS rep_frac
    FROM t WHERE len(toks) - 2 > 0
    ORDER BY doc_id""")((s, d) => repetitionMetrics(s, d))

  /** Domain-MIXTURE sampling — the "hit a target mixture across
    * sources" step of corpus assembly: a per-source quota yields a
    * per-source Bernoulli rate, and each doc is accepted iff a uniform
    * derived from md5(doc_id) clears the rate (the first 8 hex digits
    * compared against the rate as a zero-padded hex threshold —
    * fixed-width lowercase hex compares identically as string and as
    * number in every engine). Fully parallel: the per-source rate table
    * is a tiny broadcast, acceptance is pure column algebra — no
    * window, no per-group sort, no skew sensitivity. Deterministic and
    * content-independent, so re-runs and re-partitions reproduce the
    * same sample. */
  def mixtureSample(spark: SparkSession, dir: String, quotaPerSource: Int = 40): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("rate", least(lit(1.0), lit(quotaPerSource.toDouble) / col("n_docs")))
      // rate >= 1.0 means accept-all: 'g' sorts above every hex digit,
      // so the prefix compare is always true. The clamped threshold
      // 'ffffffff' silently dropped any doc whose first 8 md5 hex
      // chars are all f - deterministically, forever, for that doc_id
      // (r10 review #2; the oracle mirrored the clamp so the gate
      // could never surface it)
      .withColumn("th", when(col("rate") >= 1.0, lit("g"))
        .otherwise(format_string("%08x",
          floor(col("rate") * 4294967296.0).cast("long"))))
    val sampled = docs.join(broadcast(rates.select("source", "th")), "source")
      .where(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8) < col("th"))
      .groupBy("source").agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("sampled_chars"))
    rates.select(col("source"), col("n_docs"), dround(col("rate"), 6).as("rate"))
      .join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("rate"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("sampled_chars"), lit(0L)).as("sampled_chars"))
      .orderBy("source")
  }

  val mixture: GraftQuery = GraftQuery.checked("ns_text_mixture",
    """WITH rates AS (
      SELECT source, COUNT(*) AS n_docs,
             LEAST(1.0, 40.0 / COUNT(*)) AS rate,
             CASE WHEN LEAST(1.0, 40.0 / COUNT(*)) >= 1.0 THEN 'g'
                  ELSE printf('%08x', CAST(FLOOR(LEAST(1.0, 40.0 / COUNT(*)) * 4294967296.0) AS BIGINT))
             END AS th
      FROM documents GROUP BY source),
    sampled AS (
      SELECT d.source, COUNT(*) AS n_sampled, CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
      FROM documents d JOIN rates r USING (source)
      WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.th
      GROUP BY d.source)
    SELECT r.source, r.n_docs, ROUND(r.rate, 6) AS rate,
           COALESCE(s.n_sampled, 0) AS n_sampled,
           COALESCE(s.sampled_chars, 0) AS sampled_chars
    FROM rates r LEFT JOIN sampled s ON r.source = s.source
    ORDER BY r.source""")((s, d) => mixtureSample(s, d))

  /** Deterministic GLOBAL SHUFFLE sharding — the "shuffle the corpus
    * before training" step: shard = first hex digit of md5(doc_id)
    * (16 shards; widen the prefix for more). Pure map + aggregate —
    * the shard histogram verifies balance without materializing the
    * shuffled corpus; writing it is `df.repartition(col("shard"))`. */
  def shuffleShards(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).as("shard"),
        col("n_chars"))
      .groupBy("shard").agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("shard")

  val shuffle: GraftQuery = GraftQuery.checked("ns_text_shuffle",
    """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY shard ORDER BY shard""")((s, d) => shuffleShards(s, d))

  /** (doc_id, lang, n_tokens) — shared input of the packing formulations. */
  private def packInput(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))

  /** Exclusive per-language prefix sum of `n_tokens` in doc_id order,
    * as a DISTRIBUTED two-phase scan (classic parallel prefix sum):
    *
    *  1. chunk = floor(doc_id / chunkSize) — monotone in doc_id, so
    *     every row of chunk c precedes every row of chunk c+1; the
    *     local cumsum window partitions by (lang, chunk), giving
    *     langs × chunks reducers instead of one reducer per language;
    *  2. per-(lang, chunk) token totals are a tiny frame (one row per
    *     chunk — corpus/chunkSize rows, 3 narrow columns); the
    *     exclusive scan over THAT runs per-language on ~1000× fewer
    *     rows (recurse the same trick if even that ever matters);
    *  3. chunk offsets broadcast-join back on (lang, chunk).
    *
    * Identical output to the global-window formulation (equivalence
    * spec in QueriesSpec) — but parallelism is bounded by chunk count,
    * not language count: the fix for the round-2 plan-audit finding
    * that a 5-language 100 TB corpus funneled through 5 reducers. */
  def distributedStartOffsets(docs: DataFrame, chunkSize: Long = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunked = docs.withColumn("chunk", floor(col("doc_id") / chunkSize))
    val wLocal = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.partitionBy("lang").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunked.groupBy("lang", "chunk")
      .agg(sum("n_tokens").as("chunk_tokens"))
      .withColumn("chunk_off", coalesce(sum("chunk_tokens").over(wOff), lit(0L)))
      .select("lang", "chunk", "chunk_off")
    chunked
      .withColumn("local_cum", sum("n_tokens").over(wLocal))
      .join(broadcast(offsets), Seq("lang", "chunk"))
      .withColumn("start_off", col("chunk_off") + col("local_cum") - col("n_tokens"))
      .drop("chunk", "local_cum", "chunk_off")
  }

  /** The single-window reference formulation (per-language global
    * cumsum) — kept for the equivalence spec; do NOT use at scale. */
  def globalStartOffsets(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
  }

  /** Sequence packing: greedy sequential fill of fixed token-budget
    * context windows, per language, in doc_id order — the standard
    * "pack short docs into 2048-token sequences" step before LLM
    * training. bin = floor(cumulative_start / budget), with the
    * cumulative start computed by [[distributedStartOffsets]]. */
  val pack: GraftQuery = GraftQuery.checked("ns_text_pack",
    """WITH toks AS (
      SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
      FROM toks)
    SELECT lang, CAST(FLOOR(start_off / 2048.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM cum GROUP BY lang, bin ORDER BY lang, bin""") { (spark, dir) =>
    distributedStartOffsets(packInput(spark, dir))
      .groupBy(col("lang"), floor(col("start_off") / 2048.0).as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** SEQUENCE-LENGTH BUCKETING with padding-waste accounting — the
    * dynamic-batching prep step ([[pack]]'s alternative when examples
    * must stay un-concatenated, e.g. SFT): batch docs of similar token
    * length together (bucket cap = next power of two ≥ length) so
    * each batch pads to its bucket cap instead of the GLOBAL max. The
    * report quantifies the win per bucket: tokens, padding paid at
    * the bucket cap, and padding that WOULD be paid at the corpus
    * max — the number a pipeline owner reads to justify bucketing.
    *
    * Scale shape: bucket assignment is pure codegen'd per-row math
    * (log2 via bit-length of n−1); the waste-at-global-max column
    * needs the corpus max, a 1-row aggregate broadcast back (the
    * thresholds-pass shape of [[qualityPct]]). Exact integers
    * throughout. */
  val lengthBuckets: GraftQuery = GraftQuery.checked("ns_text_length_buckets",
    """WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    mx AS (SELECT MAX(n) AS global_max FROM toks),
    bucketed AS (
      SELECT n, global_max,
             CASE WHEN n <= 1 THEN 1
                  ELSE CAST(power(2, length(bin(n - 1))) AS BIGINT)
             END AS cap
      FROM toks CROSS JOIN mx)
    SELECT cap AS bucket_cap, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS tokens,
           CAST(SUM(cap - n) AS BIGINT) AS pad_bucketed,
           CAST(SUM(global_max - n) AS BIGINT) AS pad_unbucketed
    FROM bucketed GROUP BY cap ORDER BY bucket_cap""") { (spark, dir) =>
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val mx = toks.agg(max("n").as("global_max"))
    // cap = 2^bitlength(n−1), bit length via the binary-string repr —
    // an EXACT integer path on both engines (an ln-ratio formulation
    // risks a 1-ulp ceil() divergence exactly at the power-of-two
    // boundaries the buckets sit on); power(2, k) of an exact integer
    // k is exact in both libm and Math.pow for k ≤ 52
    val cap = when(col("n") <= 1, lit(1L))
      .otherwise(pow(lit(2.0), length(bin(col("n") - 1)).cast("double")).cast("long"))
    toks.crossJoin(broadcast(mx))
      .select(col("n"), col("global_max"), cap.as("cap"))
      .groupBy(col("cap").as("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum("n").as("tokens"),
        sum(col("cap") - col("n")).as("pad_bucketed"),
        sum(col("global_max") - col("n")).as("pad_unbucketed"))
      .orderBy("bucket_cap")
  }

  /** Corpus HEAVY HITTERS — top-N tokens by frequency, computed through
    * the bounded [[graft.functions.MisraGriesAggregator]] rather than
    * `explode + groupBy(token)`: the naive plan shuffles one row per
    * token occurrence keyed by token (maximally Zipf-skewed — the
    * busiest reducer receives count("the")), while the sketch reduces
    * per-partition into a `capacity`-bounded counter map and merges
    * maps, so only sketch-sized states cross the wire.
    *
    * At test capacity the vocabulary fits, `decrements` stays 0 and MG
    * estimates are EXACT (guarantee in the sketch's doc), so the query
    * hash-matches the exact SQL oracle while running the real sketch
    * path; the `assert_true` guard turns any silent eviction into a
    * loud failure instead of an approximate-but-unflagged answer. The
    * eviction/error-bound behavior above capacity is pinned in
    * ScaleOpsSpec. */
  def heavyHitters(spark: SparkSession, dir: String, topN: Int = 20,
                   capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.MisraGriesAggregator(capacity).toColumn
    Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("toks")).as[Seq[String]]
      // single logical group: the typed agg still reduces map-side per
      // partition, so only capacity-bounded sketches reach the merge
      .groupByKey(_ => 0)
      .agg(agg.name("sk"))
      .flatMap { case (_, sk) =>
        // exactness guard: a silent eviction must fail loudly, not
        // return approximate counts to a query contracted as exact
        require(sk.decrements == 0,
          "MisraGries evicted counters — raise capacity for exact counts")
        sk.counts.toSeq
      }
      .toDF("token", "n")
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
  }

  val heavyHittersQ: GraftQuery = GraftQuery.checked("ns_text_heavy_hitters",
    """SELECT t AS token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY t ORDER BY n DESC, t LIMIT 20""")((s, d) => heavyHitters(s, d))

  /** The Gopher-style gate thresholds — ONE source of truth for
    * [[qualityKeep]] (the funnel/pairedGate column), [[qualityFilter]]'s
    * Spark verdict AND its interpolated oracle (r10 review #3: the five
    * literals lived in three places; tuning one in qualityFilter but
    * not qualityKeep would silently diverge the funnel gate from the
    * registered verdict, and only an aggregate fixture count guarded
    * it). The pairedGate/multimodalFunnel ORACLES still inline the
    * values — a drift there turns the selfcheck red, which is the
    * detection those replicas rely on. */
  private[operators] val QMinTokens = 40
  private[operators] val QAwlMin = 3.0
  private[operators] val QAwlMax = 10.0
  private[operators] val QStopMin = 0.01
  private[operators] val QRepMax = 0.2

  /** The composite keep predicate of [[qualityFilter]] as a reusable
    * column (also the quality stage of the round-4 pipeline funnel). */
  def qualityKeep(text: Column, nChars: Column): Column = {
    val toks = tokensNonEmpty(text) // match qualityFilter's filtered oracle, codegen-safe
    val stopArr = array(stopwords.map(lit): _*)
    val nTok = size(toks)
    val awl = (nChars.cast("double") - nTok + 1) / nTok
    val stopR = size(filter(toks, w => array_contains(stopArr, w))).cast("double") / nTok
    val rep = when(nTok > 2,
      lit(1.0) - size(graft.operators.Dedup.hashedShingles(text, 3)).cast("double") / (nTok - 2))
      .otherwise(lit(1.0))
    nTok >= QMinTokens && awl >= QAwlMin && awl <= QAwlMax &&
      stopR >= QStopMin && rep <= QRepMax
  }

  /** Composite QUALITY FILTER — the Gopher-style keep/drop verdict that
    * gates documents into a training mix: minimum length, mean-word-
    * length band, function-word (stopword) floor, repetition ceiling.
    * Rules evaluate in a fixed order and the first failure names the
    * drop reason — pure column algebra over signals this module already
    * computes, one codegen'd map stage over the scan. */
  val qualityFilter: GraftQuery = GraftQuery.checked("ns_text_quality_filter",
    s"""WITH b AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             (CAST(n_chars AS DOUBLE) - len(toks) + 1) / len(toks) AS awl,
             CAST(len(list_filter(toks, w -> w IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
               / len(toks) AS stop_ratio,
             CASE WHEN len(toks) > 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) / (len(toks) - 2)
                  ELSE 1.0 END AS rep_frac
      FROM (SELECT doc_id, n_chars,
              list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS toks
            FROM documents))
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens < $QMinTokens THEN 'too_short'
                WHEN awl < $QAwlMin OR awl > $QAwlMax THEN 'word_len'
                WHEN stop_ratio < $QStopMin THEN 'low_stopwords'
                WHEN rep_frac > $QRepMax THEN 'repetitive'
                ELSE 'ok' END AS reason,
           CASE WHEN n_tokens >= $QMinTokens AND awl >= $QAwlMin AND awl <= $QAwlMax
                 AND stop_ratio >= $QStopMin AND rep_frac <= $QRepMax
                THEN 1 ELSE 0 END AS keep
    FROM b ORDER BY doc_id""") { (spark, dir) =>
    // NON-EMPTY tokens: this oracle filters empties
    // (`list_filter(..., w -> w <> '')`), so the Spark side must too —
    // unfiltered split("\\s+") counts a leading-whitespace "" token and
    // can flip the keep/reason verdict on general input (r7 review;
    // latent on the single-space fixtures)
    val toks = tokensNonEmpty(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        ((col("n_chars").cast("double") - size(toks) + 1) / size(toks)).as("awl"),
        (size(filter(toks, w => array_contains(stopArr, w))).cast("double") / size(toks))
          .as("stop_ratio"),
        when(size(toks) > 2,
          lit(1.0) - size(graft.operators.Dedup.hashedShingles(col("text"), 3)).cast("double") /
            (size(toks) - 2))
          .otherwise(lit(1.0)).as("rep_frac"))
    base.select(col("doc_id"), col("n_tokens"),
      when(col("n_tokens") < QMinTokens, "too_short")
        .when(col("awl") < QAwlMin || col("awl") > QAwlMax, "word_len")
        .when(col("stop_ratio") < QStopMin, "low_stopwords")
        .when(col("rep_frac") > QRepMax, "repetitive")
        .otherwise("ok").as("reason"),
      when(col("n_tokens") >= QMinTokens && col("awl") >= QAwlMin && col("awl") <= QAwlMax &&
        col("stop_ratio") >= QStopMin && col("rep_frac") <= QRepMax, 1).otherwise(0).as("keep"))
      .orderBy("doc_id")
  }

  /** Per-language VOCABULARY statistics — distinct token count (the
    * "vocab size" curve every corpus report carries) plus totals.
    * Exact `COUNT(DISTINCT)` here (oracle-checkable); the
    * constant-memory scale path (`approx_count_distinct`, HLL++ —
    * sketch-mergeable, no per-token shuffle) is pinned within 5% of
    * this exact answer in ScaleOpsSpec. */
  val vocab: GraftQuery = GraftQuery.checked("ns_text_vocab",
    """SELECT lang, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_vocab,
           COUNT(*) AS n_tokens
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY lang ORDER BY lang""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .groupBy("lang")
      .agg(count_distinct(col("t")).as("n_vocab"), count(lit(1)).as("n_tokens"))
      .orderBy("lang")
  }

  /** HLL-sketched vocabulary — the promised 100 TB swap for [[vocab]]:
    * `COUNT(DISTINCT token)` shuffles every distinct token to its
    * reducer (vocabulary-sized exchange, and Spark plans a two-phase
    * expand for the mixed distinct/plain agg), while HyperLogLog++
    * state is a fixed few-KB sketch per partition — the shuffle carries
    * sketches, not tokens, no matter how large the corpus. rsd=0.02:
    * ±2% standard error, guaranteed within ±6% (3σ) by the accuracy
    * spec against the exact count. Rows-only by design: HLL estimates
    * are implementation-specific (DuckDB's approx_count_distinct uses
    * a different sketch), so the driver check is rows>0 and the REAL
    * check is the in-Spark error-bound spec — same pattern as the
    * minhash/simhash emitters with soundness companions. */
  val vocabApprox: GraftQuery = GraftQuery.rowsOnly("ns_text_vocab_approx") { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("t"), 0.02).as("n_vocab_approx"),
        count(lit(1)).as("n_tokens"))
      .orderBy("lang")
  }

  /** HLL soundness gate for [[vocabApprox]] — the `_sound` convention
    * (see `ns_profile_approx_sound`): DuckDB cannot replay Spark's
    * HLL++ sketch, but it CAN agree that nothing violated the bound.
    * Per language, the rsd=0.02 estimate is audited against the exact
    * `COUNT(DISTINCT token)`; rows where
    * |approx − exact| > 6%·exact + 16 are emitted (3σ of the ±2%
    * standard error, +16 absolute slack for the small-cardinality
    * regime where HLL++ switches to bias-corrected linear counting),
    * and the oracle is the empty relation.
    *
    * Scale: one corpus pass — both aggregates share the explode and
    * the group shuffle (Catalyst plans the mixed distinct/plain agg as
    * one expand); in production the exact side is dropped and only the
    * mergeable sketch remains — this query exists to license that drop. */
  val vocabApproxSound: GraftQuery = GraftQuery.checked("ns_text_vocab_approx_sound",
    """SELECT CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_vocab_exact,
           CAST(NULL AS BIGINT) AS n_vocab_approx
    WHERE 1 = 0""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .groupBy("lang")
      .agg(count_distinct(col("t")).as("n_vocab_exact"),
        approx_count_distinct(col("t"), 0.02).as("n_vocab_approx"))
      .where(abs(col("n_vocab_approx") - col("n_vocab_exact")) >
        col("n_vocab_exact") * 0.06 + 16)
      .orderBy("lang")
  }

  /** TF-IDF top terms per document — the classic term-weighting pass
    * (keyword extraction / relevance features for corpus curation).
    * tf = in-doc occurrences, idf = ln((N+1)/(df+1)); top-3 terms per
    * doc with deterministic (score DESC, token) ranking. Two partial-
    * aggregated shuffles (doc-term counts, per-term doc frequency: the
    * df side is vocabulary-sized → broadcast back); ROUNDed before the
    * rank so both engines order identically. */
  val tfidf: GraftQuery = GraftQuery.checked("ns_text_tfidf",
    """WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    tf AS (
      SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
    df AS (
      SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.t AS token,
             ROUND(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 4) AS tfidf
      FROM tf JOIN df ON tf.t = df.t CROSS JOIN n),
    ranked AS (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
      FROM scored)
    SELECT doc_id, token, tfidf FROM ranked
    WHERE rn <= 3 AND doc_id < 100
    ORDER BY doc_id, tfidf DESC, token""") { (spark, dir) =>
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    // ONE token explode: tf already holds one row per (doc, term), so
    // document frequency is a plain row count over tf — no second
    // corpus-wide explode + COUNT(DISTINCT) shuffle
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = OpMemo.cachedLong(spark, dir, "text:ndocs")(
      Tables.documents(spark, dir).count())
    val scored = tf.join(broadcast(df), "t")
      .select(col("doc_id"), col("t").as("token"),
        dround(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 4).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    // doc_id < 100 BEFORE the window (r15): the window partitions by
    // doc_id, so ranks inside the kept docs are unchanged, but the
    // optimizer does not push this conjunct through the Window itself
    // and was ranking all docs to keep 100 (df/tf above stay
    // corpus-wide — document frequency is global by definition)
    scored.where(col("doc_id") < 100)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("doc_id", "token", "tfidf")
      .orderBy(col("doc_id"), col("tfidf").desc, col("token"))
  }

  /** STRATIFIED deterministic sampling — exactly `perLang` docs per
    * language (vs [[mixtureSample]]'s rate-based expectation): rank
    * inside each stratum by the content-independent md5(doc_id) and
    * keep the first `perLang`. Reproducible across runs/partitionings;
    * at 100 TB the per-stratum rank is the bounded-state aggregator
    * shape ([[graft.functions.TopKAggregator]]), not a full sort — the
    * window form here mirrors the oracle 1:1. */
  def stratifiedSample(spark: SparkSession, dir: String, perLang: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("rk"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string").cast("binary")).as("rk"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perLang)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy("lang", "rn")
  }

  val stratified: GraftQuery = GraftQuery.checked("ns_text_stratified",
    """SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 10 ORDER BY lang, rn""")((s, d) => stratifiedSample(s, d))

  /** Corpus-trained BIGRAM language-model scoring — the CCNet/KenLM-
    * style quality signal: documents whose word transitions are
    * improbable under a model trained on the corpus itself score low
    * (boilerplate/garbled text), high-likelihood text scores high. Per
    * doc: the mean log P(w2|w1) over its bigrams, with
    * P(w2|w1) = c(w1,w2) / c(w1·) from exact corpus counts (no
    * smoothing needed — scoring the training corpus means every bigram
    * was seen).
    *
    * Scale design: training is two partial-aggregated shuffles (bigram
    * counts, then first-word marginals derived from them — the tf/df
    * trick, no second corpus explode); scoring joins doc bigrams to the
    * model on (w1, w2) — the SAME key the training shuffle used. The
    * model is corpus-bigram-sized, so it shuffle-joins rather than
    * broadcasting (unlike tfidf's vocab-sized df frame); at 100 TB you
    * prune it to the top-M bigrams + a unigram backoff column, which
    * changes the model CTE, not the plan shape. Determinism: counts are
    * exact integers; per-bigram logp and the final mean are doubles
    * ROUNDed to 4 — the k19 avg contract. */
  val perplexity: GraftQuery = GraftQuery.checked("ns_text_perplexity",
    // NON-EMPTY whitespace-run tokens — the same contract as the Spark
    // side's native positional kernel, which skips whitespace runs; the
    // old string_split(text, ' ') kept empty tokens on doubled/leading
    // spaces and diverged on general input (r7 review)
    """WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
      FROM documents),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t)),
               i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
      FROM toks WHERE len(t) >= 2),
    bgf AS (SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2 FROM bg),
    cnt2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bgf GROUP BY w1, w2),
    cnt1 AS (SELECT w1, SUM(c2) AS c1 FROM cnt2 GROUP BY w1),
    model AS (
      SELECT w1, w2, ln(CAST(c2 AS DOUBLE)) - ln(CAST(c1 AS DOUBLE)) AS logp
      FROM cnt2 JOIN cnt1 USING (w1))
    SELECT b.doc_id, b.lang, COUNT(*) AS n_bigrams,
           ROUND(AVG(m.logp), 4) AS avg_logp
    FROM bgf b JOIN model m USING (w1, w2)
    GROUP BY b.doc_id, b.lang
    ORDER BY b.doc_id""") { (spark, dir) =>
    perplexityFrame(spark, dir).orderBy("doc_id")
  }

  /** The per-doc bigram-LM frame `(doc_id, lang, n_bigrams, avg_logp)`
    * shared by [[perplexity]] and [[TextSelection.ccnetBuckets]] —
    * memoized via [[OpMemo]] like every other shared emitter frame.
    *
    * All shuffle keys are LONGS from the native positional kernel
    * (w=2 hash = the bigram key, w=1 hash = its first-word marginal
    * key; hash equality ≡ string equality at 2^-64, the repo-wide
    * convention): the original string-struct formulation shuffled
    * full word pairs three times and benched 6× slower than DuckDB.
    * Counts (hence logp) are identical, so the string oracle stands. */
  private[graft] def perplexityFrame(spark: SparkSession, dir: String): DataFrame =
    OpMemo.cached(spark, dir, "text:perplexity-frame") {
    import graft.functions.TextExpressions.positionalShingleHashes
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        positionalShingleHashes(col("text"), 1).as("th"),
        positionalShingleHashes(col("text"), 2).as("bh"))
      .where(size(col("bh")) >= 1)
    val bgf = toks.select(col("doc_id"), col("lang"),
      explode(transform(sequence(lit(1), size(col("bh"))),
        i => struct(element_at(col("th"), i).as("h1"),
          element_at(col("bh"), i).as("h2")))).as("p"))
      .select(col("doc_id"), col("lang"), col("p.h1"), col("p.h2"))
    // h1 is functionally determined by h2 (same first word), so carry
    // it through the bigram count instead of grouping on both
    val cnt2 = bgf.groupBy("h2").agg(count(lit(1)).as("c2"), max("h1").as("h1"))
    val cnt1 = cnt2.groupBy("h1").agg(sum("c2").as("c1"))
    val model = cnt2.join(cnt1, "h1")
      .select(col("h2"),
        (log(col("c2").cast("double")) - log(col("c1").cast("double"))).as("logp"))
    bgf.join(model, Seq("h2"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), dround(avg("logp"), 4).as("avg_logp"))
  }

  /** Sliding token-WINDOW chunking — the context-window prep step every
    * training/RAG pipeline runs between curation and tokenization:
    * split each document into C-token chunks on an S-token stride
    * (C=64, S=48 → 16-token overlap so no boundary loses context), last
    * chunk short rather than dropped (every token lands in >= 1 chunk).
    *
    * Scale design: pure per-row column algebra — `sequence` over the
    * chunk count, `slice` per chunk, one `posexplode` — a single
    * codegen'd map stage with ZERO shuffle (row inflation = chunks per
    * doc ~ len/S, the output's own size). No window, no join, no agg:
    * this is the shape that runs at scan speed on 100 TB. Chunks are
    * emitted as md5 digests + positions (the digest pins the exact
    * string content against the oracle without shipping the text
    * twice); a real pipeline would select the slice itself instead. */
  /** Chunk size / stride shared by the Spark plan and the oracle SQL
    * (interpolated — the semDedup-tau advice, applied preemptively). */
  private val ChunkC = 64
  private val ChunkS = 48

  val chunk: GraftQuery = GraftQuery.checked("ns_text_chunk",
    s"""WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS t
      FROM documents),
    c AS (
      SELECT doc_id, lang, len(t) AS n, t,
             unnest(range(0, CASE WHEN len(t) <= $ChunkC THEN 1
               ELSE 1 + CAST(ceil((len(t) - $ChunkC) / $ChunkS.0) AS BIGINT) END)) AS k
      FROM t WHERE len(t) >= 1)
    SELECT doc_id, lang, k AS chunk_idx, k * $ChunkS + 1 AS start_tok,
           LEAST($ChunkC, n - k * $ChunkS) AS n_tokens,
           md5(array_to_string(t[(k*$ChunkS+1):(k*$ChunkS+$ChunkC)], ' ')) AS chunk_md5
    FROM c ORDER BY doc_id, chunk_idx""")((s, d) =>
    chunkFrame(s, d).orderBy("doc_id", "chunk_idx"))

  /** The un-ordered chunk frame (doc_id, lang, chunk_idx, start_tok,
    * n_tokens, chunk_md5) — shared by [[chunk]] and [[chunkDedup]]. */
  private def chunkFrame(spark: SparkSession, dir: String): DataFrame = {
    val C = ChunkC; val S = ChunkS
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        tokensNonEmpty(col("text")).as("t"))
      .where(size(col("t")) >= 1)
    val n = size(col("t"))
    val nChunks = when(n <= C, lit(1))
      .otherwise(lit(1) + ceil((n - C).cast("double") / S).cast("int"))
    toks
      .select(col("doc_id"), col("lang"), n.as("n"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          k => md5(concat_ws(" ", slice(col("t"), k * S + 1, lit(C)))))))
      .toDF("doc_id", "lang", "n", "chunk_idx", "chunk_md5")
      .select(col("doc_id"), col("lang"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * S + 1).cast("long").as("start_tok"),
        least(lit(C), col("n") - col("chunk_idx") * S).cast("long").as("n_tokens"),
        col("chunk_md5"))
  }

  /** CHUNK-LEVEL exact dedup — RAG-store maintenance: the retrieval
    * index stores CHUNKS, not documents, and identical context windows
    * (boilerplate, templated spans, overlap-stride repeats) waste
    * index space and skew retrieval toward duplicated content. Dedup
    * is corpus-wide by chunk digest with the deterministic keep-first
    * rule (min (doc_id, chunk_idx) copy is canonical); the output is
    * the per-language index-maintenance report: occurrences, kept
    * canonical copies, dropped duplicates.
    *
    * Scale shape: NO window over the digest key — a boilerplate chunk
    * repeated 10⁶ times would make `row_number() OVER (PARTITION BY
    * digest)` sort a whale partition. Instead the canonical copy per
    * digest is a `min(struct(doc_id, chunk_idx, lang))` AGGREGATE
    * (map-side partial combine bounds the whale at one row per task),
    * and the summary re-aggregates the digest-sized frame by the
    * canonical copy's language. The oracle uses the window formulation
    * — equivalent because (doc_id, chunk_idx) is unique — so the gate
    * also proves the aggregate rewrite result-transparent. */
  val chunkDedup: GraftQuery = GraftQuery.checked("ns_text_chunk_dedup",
    s"""WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS t
      FROM documents),
    c AS (
      SELECT doc_id, lang, len(t) AS n, t,
             unnest(range(0, CASE WHEN len(t) <= $ChunkC THEN 1
               ELSE 1 + CAST(ceil((len(t) - $ChunkC) / $ChunkS.0) AS BIGINT) END)) AS k
      FROM t WHERE len(t) >= 1),
    chunks AS (
      SELECT doc_id, lang, k AS chunk_idx,
             md5(array_to_string(t[(k*$ChunkS+1):(k*$ChunkS+$ChunkC)], ' ')) AS chunk_md5
      FROM c),
    flagged AS (
      SELECT lang,
             ROW_NUMBER() OVER (PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx) = 1 AS kept
      FROM chunks)
    SELECT lang, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM flagged GROUP BY lang ORDER BY lang""") { (spark, dir) =>
    val chunks = chunkFrame(spark, dir)
    val canonical = chunks
      .groupBy("chunk_md5")
      .agg(min(struct(col("doc_id"), col("chunk_idx"), col("lang"))).as("m"))
      .select(col("m.lang").as("lang"))
    val totals = chunks.groupBy("lang").agg(count(lit(1)).as("n_chunks"))
    val kept = canonical.groupBy("lang").agg(count(lit(1)).as("n_kept"))
    totals.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy("lang")
  }

  private val QPctP = 0.25
  private val QPctRound = 4

  /** PERCENTILE-THRESHOLD quality gate: instead of the fixed composite
    * predicate ([[qualityFilter]]), drop each language's bottom
    * quartile by quality score — the adaptive variant a real corpus
    * pipeline prefers, because a fixed threshold calibrated on English
    * silently over- or under-prunes other languages.
    *
    * Scale shape: pass 1 computes per-language thresholds — a groupBy
    * whose result is languages-sized (tiny); pass 2 broadcast-joins
    * the thresholds back and counts kept/dropped with map-side partial
    * aggregation. No corpus-wide window (a `percent_rank() OVER
    * (PARTITION BY lang)` formulation would shuffle and SORT the whole
    * corpus into one partition per language — the skewed-reducer shape
    * the pack operator's plan pin bans). Spark's exact `percentile`
    * buffers each group's values on its reducer, fine for a
    * thresholds pass at test scale; at 100 TB swap in
    * `approx_percentile` (t-digest — mergeable map-side, bounded
    * memory), the same documented swap as the median query
    * ([[Analytics2]]). Cross-engine contract: Spark exact `percentile`
    * and DuckDB `quantile_cont` share the same sort + linear
    * interpolation definition; the threshold is ROUNDed to
    * [[QPctRound]] dp on BOTH sides before the (unrounded,
    * bit-identical) scores compare against it, so the kept/dropped
    * split is engine-exact. */
  val qualityPct: GraftQuery = GraftQuery.checked("ns_text_quality_pct",
    s"""WITH base AS (
      SELECT lang,
             CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  w -> w IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS INTEGER) AS n_stop
      FROM documents),
    scored AS (
      SELECT lang,
             LEAST(1.0, n_tokens / 100.0) * (1 - CAST(n_stop AS DOUBLE) / n_tokens) AS q
      FROM base),
    thr AS (
      SELECT lang, ROUND(quantile_cont(q, $QPctP), $QPctRound) AS q_thr
      FROM scored GROUP BY lang)
    SELECT s.lang, COUNT(*) AS n_docs, t.q_thr,
           CAST(SUM(CASE WHEN s.q >= t.q_thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN s.q < t.q_thr THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM scored s JOIN thr t USING (lang)
    GROUP BY s.lang, t.q_thr
    ORDER BY s.lang""") { (spark, dir) =>
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val scored = Tables.documents(spark, dir)
      .select(col("lang"),
        size(toks).as("n_tokens"),
        size(filter(toks, w => array_contains(stopArr, w))).as("n_stop"))
      .select(col("lang"),
        (least(lit(1.0), col("n_tokens") / 100.0) *
          (lit(1) - col("n_stop").cast("double") / col("n_tokens"))).as("q"))
    val thr = scored.groupBy("lang")
      .agg(dround(expr(s"percentile(q, $QPctP)"), QPctRound).as("q_thr"))
    scored.join(broadcast(thr), "lang")
      .groupBy(col("lang"), col("q_thr"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") >= col("q_thr"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("q") < col("q_thr"), 1L).otherwise(0L)).as("n_dropped"))
      .select("lang", "n_docs", "q_thr", "n_kept", "n_dropped")
      .orderBy("lang")
  }

  private val QPctAcc = 10000

  /** Soundness companion for the documented 100 TB swap of
    * [[qualityPct]]: the exact `percentile` buffers each language's
    * values on one reducer, so at scale the plan swaps in
    * `approx_percentile` (Greenwald–Khanna sketch — mergeable
    * map-side, bounded memory). This query PROVES the sketch's rank
    * guarantee on this corpus instead of asserting it: per language it
    * computes the approx threshold, counts the true rank INTERVAL of
    * that threshold value (one corpus pass: `[count(q < v)+1,
    * count(q ≤ v)]` — a duplicated score occupies a rank RUN, and the
    * sketch only promises some rank in that run is close), and emits a
    * violation row if the run misses p·n ± (n/accuracy + 2) — the GK
    * ε = 1/accuracy relative-rank bound with integer-boundary slop.
    * (The first formulation compared `count(≤ v)` alone and failed
    * honestly at sf0.1: lang=en's quartile lands in a tie run of ~15
    * equal scores, whose top is rank 526 vs bound 518.) The oracle is
    * the EMPTY relation, the `*_sound` contract every probabilistic
    * operator here follows. The sketch's element choice may vary with
    * partition merge order; ANY correct run satisfies the bound, which
    * is exactly why the check is rank-based, not value-based. */
  /** Pre-filter frame behind [[qualityPctSound]]: one row per language
    * with the sketch threshold's true rank run and the GK bound
    * interval. Exposed so QueriesSpec can assert the check is
    * non-vacuous (every language produces an interval row with
    * run_lo <= run_hi) before the violation filter empties it. */
  def qualityPctRankIntervals(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val scored = Tables.documents(spark, dir)
      .select(col("lang"),
        size(toks).as("n_tokens"),
        size(filter(toks, w => array_contains(stopArr, w))).as("n_stop"))
      .select(col("lang"),
        (least(lit(1.0), col("n_tokens") / 100.0) *
          (lit(1) - col("n_stop").cast("double") / col("n_tokens"))).as("q"))
    val agg = scored.groupBy("lang").agg(
      count(lit(1)).as("n"),
      expr(s"approx_percentile(q, $QPctP, $QPctAcc)").as("thr_a"))
    scored.join(broadcast(agg), "lang")
      .groupBy(col("lang"), col("n"), col("thr_a"))
      .agg((sum(when(col("q") < col("thr_a"), 1L).otherwise(0L)) + 1L).as("run_lo"),
        sum(when(col("q") <= col("thr_a"), 1L).otherwise(0L)).as("run_hi"))
      .select(col("lang"), col("n").as("n_docs"),
        (floor(col("n") * QPctP) - ceil(col("n").cast("double") / QPctAcc) - 2).cast("long").as("rank_lo"),
        col("run_lo"), col("run_hi"),
        (ceil(col("n") * QPctP) + ceil(col("n").cast("double") / QPctAcc) + 2).cast("long").as("rank_hi"))
  }

  val qualityPctSound: GraftQuery = GraftQuery.checked("ns_text_quality_pct_sound",
    """SELECT CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS rank_lo, CAST(NULL AS BIGINT) AS run_lo,
           CAST(NULL AS BIGINT) AS run_hi, CAST(NULL AS BIGINT) AS rank_hi
    WHERE 1 = 0""") { (spark, dir) =>
    qualityPctRankIntervals(spark, dir)
      .where(col("run_hi") < col("rank_lo") || col("run_lo") > col("rank_hi"))
      .orderBy("lang")
  }

  /** Per-language LENGTH-MODEL diagnostics: Pearson correlation and
    * least-squares slope of chars-vs-tokens — the drift monitor a
    * corpus pipeline runs per ingest batch (a language whose
    * chars-per-token regression shifts between snapshots signals a
    * tokenizer or extraction regression upstream).
    *
    * Determinism contract (the k-means / anomaly playbook): both
    * inputs are INTEGERS (n_chars from the table, n_tokens from the
    * whitespace split), so all five moment sums Σx Σy Σx² Σy² Σxy are
    * EXACT — accumulated as DECIMAL(38,0) on the Spark side and
    * HUGEINT on the oracle side (BIGINT Σx² wraps silently in
    * non-ANSI Spark once Σ n_chars² exceeds ~9.2e18, plausible at
    * 100 TB). corr and slope are then CLOSED double formulas over
    * those exact sums — no streaming `corr()` kernel on either
    * engine, whose accumulation order varies run-to-run. Degenerate
    * denominators (a language with constant length or a single doc)
    * are guarded to NULL identically on both engines.
    *
    * Scale shape: one corpus pass, map-side partial aggregation into
    * a languages-sized (tiny) shuffle — the cheapest possible plan
    * for a full-corpus statistic; nothing downstream touches the
    * corpus again.
    */
  val corrStats: GraftQuery = GraftQuery.checked("ns_text_corr",
    """WITH t AS (
      SELECT lang, n_chars,
             CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    s AS (
      SELECT lang, COUNT(*) AS n_docs,
             SUM(CAST(n_chars AS HUGEINT)) AS sx,
             SUM(CAST(n_tokens AS HUGEINT)) AS sy,
             SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx,
             SUM(CAST(n_tokens AS HUGEINT) * n_tokens) AS syy,
             SUM(CAST(n_chars AS HUGEINT) * n_tokens) AS sxy
      FROM t GROUP BY lang),
    m AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
             CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x,
             CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y
      FROM s)
    SELECT lang, n_docs,
           ROUND(cov_n / NULLIF(sqrt(var_x) * sqrt(var_y), 0), 4) AS corr_chars_tokens,
           ROUND(cov_n / NULLIF(var_x, 0), 6) AS chars_per_token_slope
    FROM m ORDER BY lang""") { (spark, dir) =>
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    val s = Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(d19(col("n_chars"))).as("sx"), sum(d19(col("n_tokens"))).as("sy"),
        sum(d19(col("n_chars")) * d19(col("n_chars"))).as("sxx"),
        sum(d19(col("n_tokens")) * d19(col("n_tokens"))).as("syy"),
        sum(d19(col("n_chars")) * d19(col("n_tokens"))).as("sxy"))
    val n = col("n_docs").cast("double")
    val covN = n * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val varX = n * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val varY = n * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    val denom = sqrt(varX) * sqrt(varY)
    s.select(col("lang"), col("n_docs"),
      dround(covN / when(denom =!= 0.0, denom), 4).as("corr_chars_tokens"),
      dround(covN / when(varX =!= 0.0, varX), 6).as("chars_per_token_slope"))
      .orderBy("lang")
  }

  /** Sample size for [[weightedSample]] (shared-constant contract). */
  private[graft] val WSampleK = 20

  /** WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis A-ES)
    * — draw [[WSampleK]] docs with inclusion probability proportional
    * to length: the "sample a review set biased toward the documents
    * that dominate the token budget" primitive ([[hashSample]] and
    * [[stratified]] are its unweighted/per-stratum siblings).
    *
    * Scale shape: priority = u^(1/w) per row (pure map; u is the
    * md5-of-doc_id uniform — the [[shuffle]] determinism device, 48
    * hash bits → ~2.8e14 distinct levels) and the global top-k is a
    * bounded `TakeOrderedAndProject` — no sort, no shuffle beyond the
    * k-row final heap merge. Determinism note: selection depends only
    * on priority ORDER; u and w are bit-identical across engines, and
    * pow's sub-ulp libm differences can only matter if two priorities
    * coincide to ~1e-16 relative — vanishing for hash-spread u, and
    * the cross-engine gate would catch it loudly. */
  val weightedSample: GraftQuery = GraftQuery.checked("ns_text_weighted_sample",
    s"""WITH pri AS (
      SELECT doc_id, n_chars,
             pow(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
                   / 281474976710656.0,
                 1.0 / n_chars) AS priority
      FROM documents)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, ROUND(priority, 6) AS priority
    FROM pri
    ORDER BY priority DESC, doc_id
    LIMIT $WSampleK""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        pow(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
            .cast("long") / lit(281474976710656.0),
          lit(1.0) / col("n_chars")).as("priority"))
      .select(col("doc_id"), col("n_chars"), dround(col("priority"), 6).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(WSampleK)
  }

  val all: Seq[GraftQuery] = Seq(textStats, fingerprint, tokenCounts, langStats, langId,
    redact, hashSample, mixture, shuffle, repetition, pack, heavyHittersQ, qualityFilter,
    vocab, vocabApprox, vocabApproxSound, tfidf, stratified, perplexity, chunk, chunkDedup, lengthBuckets, corrStats, qualityPct,
    qualityPctSound, weightedSample)
}
