package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.GraftQuery.checked
import graft.sources.Tables

/** BPE (byte-pair-encoding) TOKENIZER TRAINING — the canonical
  * vocabulary-learning step of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): repeatedly find the most frequent adjacent symbol pair in
  * the corpus and merge it into a new symbol, emitting the learned
  * merge table in rank order.
  *
  * Scale shape — the classic BPE trick is that training never touches
  * the corpus after ONE word-count pass:
  *
  *   1. `words`: one corpus explode + word-keyed groupBy (map-side
  *      partials, vocabulary-sized key space) — the only corpus-sized
  *      stage at any scale.
  *   2. Every merge iteration runs on the VOCABULARY frame (distinct
  *      words × counts — model-sized relative to a 100 TB corpus,
  *      still distributed): one adjacent-pair emission (inline
  *      `zip_with` of the sequence against its own tail — pure
  *      codegen, no shuffle) + a pair-keyed sum whose key space is
  *      bounded by the live symbol alphabet squared, then an argmax
  *      via `TakeOrderedAndProject` (limit 1).
  *   3. The only driver traffic is that 1-row argmax per iteration —
  *      the model itself, same contract as the k-means centroid
  *      update (VectorsKmeans.scala) — and the greedy merge is a
  *      per-row `aggregate` fold, codegen'd, no join.
  *
  * The greedy left-to-right fold encodes BPE's standard merge
  * semantics (overlapping runs merge alternately: `a a a` with merge
  * (a,a) → `aa a`) with a string accumulator: append `r` WITHOUT a
  * separator when the accumulator's last complete symbol is exactly
  * `l` — "complete" enforced by the space-boundary check, and a
  * just-merged tail can never re-match because `l+r` ≠ `l` for any
  * non-empty `r`. Both engines run the identical fold (Spark
  * `aggregate`, DuckDB `list_reduce`), so segmentations match
  * byte-for-byte; all counts are exact integers and argmax ties break
  * on (count DESC, l, r) on both sides. The oracle unrolls the same
  * [[NumMerges]] iterations as chained CTEs, the [[MetaQueries.pageRank]]
  * convention — the iterative argmax cannot live in a recursive CTE.
  *
  * The reference pipeline (see /root/reference/src/kalytical/api.py
  * job-submission surface) runs tokenization as an opaque engine job;
  * here the training itself is the engine's own distributed plan.
  */
object TextBpe {

  /** Merge-table size — interpolated into BOTH the DataFrame loop and
    * the oracle's unrolled CTE chain (shared-constant contract). Real
    * vocabularies use 30–100k merges; the plan per iteration is
    * identical, only the loop count grows. */
  private[graft] val NumMerges = 8

  /** One corpus pass: lowercased whitespace tokens → (word, freq).
    * Shared with [[TextFuzzy]] so the two vocabulary operators can't
    * drift on tokenization. */
  private[operators] def wordFreqs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(filter(split(lower(col("text")), "\\s+"), w => w =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right merge of adjacent symbol pair (l, r) inside
    * a space-free symbol sequence — the codegen'd per-row fold shared
    * by the training loop and the apply path.
    *
    * The fold starts from an empty accumulator (symbols are never
    * empty, so `acc = ""` uniquely marks the first element) instead of
    * the head+tail form so `seqCol` appears EXACTLY ONCE in the
    * expression: the apply path chains [[NumMerges]] of these in one
    * projection, and a head+tail form (4 references per level) makes
    * the chained tree grow 4^merges — unanalyzable past a handful of
    * merges, let alone a real 30k-merge vocabulary. Single-reference
    * folds keep the chain linear in merge count. */
  private[graft] def mergeFold(seqCol: Column, l: String, r: String): Column = {
    val folded = aggregate(
      seqCol,
      lit(""),
      (acc, x) =>
        when(acc === lit(""), x)
          .when((acc === lit(l) || acc.endsWith(lit(" " + l))) && x === lit(r),
            concat(acc, x))
          .otherwise(concat(acc, lit(" "), x)))
    split(folded, " ")
  }

  /** Train [[NumMerges]] merges over a `(word, freq)` vocabulary.
    * Returns (rank, l, r, pairCount) in rank order. Each iteration's
    * vocab frame is cached and the previous unpersisted (the pageRank
    * lineage discipline); the per-iteration collect is the 1-row
    * argmax — the model, not data. */
  private[graft] def bpeTrain(words: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words.select(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("seq"),
      col("freq")).cache()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    for (t <- 1 to numMerges) {
      val top = vocab
        .select(explode(expr(
          """zip_with(slice(seq, 1, size(seq) - 1), slice(seq, 2, size(seq) - 1),
            |         (a, b) -> struct(a AS l, b AS r))""".stripMargin)).as("pr"),
          col("freq"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((t, l, r, cnt))
        val next = vocab.select(mergeFold(col("seq"), l, r).as("seq"), col("freq")).cache()
        next.count()
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Memoized merge table for a data dir — shared by both queries and
    * warm bench re-runs. */
  private def mergesDf(spark: SparkSession, dir: String): DataFrame =
    OpMemo.cached(spark, dir, "bpe_merges") {
      import spark.implicits._
      bpeTrain(wordFreqs(spark, dir), NumMerges)
        .toDF("merge_rank", "sym_l", "sym_r", "pair_count")
    }

  /** Shared oracle prefix: the word-count pass plus `n` unrolled
    * (pair-count, argmax, fold-merge) iterations. */
  private def oracleCtes(n: Int): String = {
    val base = """WITH words AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS word
        FROM documents)
      GROUP BY word),
    v0 AS (SELECT list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) AS seq, freq
           FROM words)"""
    val iters = (1 to n).map { i =>
      s""",
    p$i AS (SELECT pr.l AS l, pr.r AS r, SUM(freq) AS cnt
       FROM (SELECT unnest(list_transform(range(1, len(seq)), k -> {'l': seq[k], 'r': seq[k + 1]})) AS pr,
                    freq
             FROM v${i - 1})
       GROUP BY 1, 2),
    m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
    v$i AS (SELECT string_split(list_reduce(seq, (acc, x) ->
         CASE WHEN (acc = m.l OR ends_with(acc, ' ' || m.l)) AND x = m.r
              THEN acc || x ELSE acc || ' ' || x END), ' ') AS seq, freq
       FROM v${i - 1} CROSS JOIN m$i m)"""
    }.mkString
    base + iters
  }

  /** The learned merge table itself. */
  val bpe: GraftQuery = checked("ns_text_bpe",
    oracleCtes(NumMerges) + "\n    " +
      (1 to NumMerges).map { i =>
        s"SELECT $i AS merge_rank, l AS sym_l, r AS sym_r, l || r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM m$i"
      }.mkString("\n    UNION ALL ") +
      "\n    ORDER BY merge_rank") { (spark, dir) =>
    mergesDf(spark, dir)
      .select(col("merge_rank"), col("sym_l"), col("sym_r"),
        concat(col("sym_l"), col("sym_r")).as("merged"), col("pair_count"))
      .orderBy("merge_rank")
  }

  /** APPLY the trained tokenizer: segment every vocabulary word with
    * the collected merge table (model-sized driver value, like a
    * broadcast dictionary) as [[NumMerges]] chained per-row folds —
    * ONE codegen map pass, zero iterative actions — then count the
    * resulting subword inventory. At corpus scale this is the
    * map-side-join shape of real tokenization: the corpus joins the
    * vocabulary→segmentation dictionary; the weighted counts here are
    * identical because the vocab frame already carries corpus
    * frequencies. */
  val bpeTokens: GraftQuery = checked("ns_text_bpe_tokens",
    oracleCtes(NumMerges) + s"""
    SELECT sub AS subword,
           CAST(COUNT(*) AS BIGINT) AS n_forms,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(seq) AS sub, freq FROM v$NumMerges)
    GROUP BY 1
    ORDER BY subword""") { (spark, dir) =>
    segmented(spark, dir)
      .select(explode(col("seq")).as("subword"), col("freq"))
      .groupBy("subword")
      .agg(count(lit(1)).as("n_forms"), sum("freq").as("n_occurrences"))
      .orderBy("subword")
  }

  /** The apply path's segmentation frame `(word, seq, freq)` —
    * exposed for the lossless-roundtrip spec. */
  private[graft] def segmented(spark: SparkSession, dir: String): DataFrame = {
    val merges = mergesDf(spark, dir)
      .orderBy("merge_rank").collect()
      .map(rw => (rw.getString(1), rw.getString(2)))
    val seg = merges.foldLeft(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")) {
      case (c, (l, r)) => mergeFold(c, l, r)
    }
    wordFreqs(spark, dir).select(col("word"), seg.as("seq"), col("freq"))
  }

  val all: Seq[GraftQuery] = Seq(bpe, bpeTokens)
}
