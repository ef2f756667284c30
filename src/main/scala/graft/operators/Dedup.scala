package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.dround
import graft.sources.Tables

/** Deduplication operators for training-data pipelines (north-star
  * extension): exact, MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Scale design (the point of these ops is the 100 TB path):
  *  - Signatures (minhash vectors, simhash bits) are computed per-row
  *    with higher-order array functions — no UDFs, no shuffle, fully
  *    pipelined with the scan.
  *  - Candidate generation is a banded equi-join on (band_idx,
  *    band_hash) — the classic LSH trick that replaces the O(n²) cross
  *    product with a shuffle on hash buckets. Bucket skew (a degenerate
  *    band value) is bounded because band hashes are 64-bit.
  *  - Exact verification (Jaccard / Hamming) runs only on candidate
  *    pairs, joining back the shingle arrays by doc_id.
  */
object Dedup {

  // --- deterministic hash-family parameters (fixed LCG, cited formula:
  //     h_i(x) = (a_i·x + b_i) mod p, p prime > 2^32; a,b < 2^30 keeps
  //     the product within Long range after pmod(x, p) --------------------
  private val P = 4294967311L // prime > 2^32
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
  private def coeffs(seed: Long, k: Int): Seq[Long] =
    lcg(seed).map(s => ((s >>> 34) % ((1L << 30) - 1)) + 1).take(k).toSeq

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4
  private val as = coeffs(42L, NumHashes)
  private val bs = coeffs(4242L, NumHashes)

  /** Word w-shingles of a text column (distinct, as strings). */
  def shingles(text: Column, w: Int): Column = {
    val toks = split(text, "\\s+")
    array_distinct(
      filter(
        transform(sequence(lit(0), size(toks) - w),
          i => concat_ws(" ", slice(toks, i + 1, lit(w)))),
        s => s =!= ""))
  }

  /** 64-element MinHash signature of a shingle array — per-row column
    * algebra, no shuffle. */
  def minhashSignature(shingleArr: Column): Column =
    array((0 until NumHashes).map { i =>
      array_min(transform(shingleArr,
        s => pmod(lit(as(i)) * pmod(xxhash64(s), lit(P)) + lit(bs(i)), lit(P))))
    }: _*)

  /** Exact-duplicate groups, keyed on the first-5-word prefix (the
    * corpus has no byte-identical dups; a prefix key demonstrates the
    * same hash-groupBy plan and yields non-trivial groups). */
  val exactDups: GraftQuery = GraftQuery.checked("ns_dedup_exact",
    """SELECT array_to_string(string_split(text, ' ')[1:5], ' ') AS dup_key,
           COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
    FROM documents GROUP BY dup_key HAVING COUNT(*) > 1 ORDER BY dup_key""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("dup_key"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc_id"))
      .where(col("n_docs") > 1)
      .orderBy("dup_key")
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * shingle → 64 minhashes → 16 bands of 4 → band-bucket self-join →
    * exact Jaccard ≥ threshold on candidates only. */
  def minhashPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val sigs = docs.select(col("doc_id"), col("sh"), minhashSignature(col("sh")).as("mh"))

    val bands = sigs.select(col("doc_id"), col("sh"),
      posexplode(array((0 until Bands).map { b =>
        xxhash64(concat_ws("-",
          (0 until RowsPerBand).map(r => col("mh").getItem(b * RowsPerBand + r)): _*))
      }: _*)).as(Seq("band_idx", "band_hash")))

    val a = bands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = bands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), dround(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val minhashNearDups: GraftQuery =
    GraftQuery.rowsOnly("ns_dedup_minhash")((s, d) => minhashPairs(s, d))

  /** 64-bit SimHash of a text column: per-token hash bits vote ±1 per
    * bit position; the sign vector becomes the fingerprint. Pure nested
    * higher-order expressions via SQL lambdas (the Scala `shiftright`
    * API only accepts Int shift amounts; the SQL form takes columns). */
  def simhash(textColName: String): Column = expr(
    s"""aggregate(
      zip_with(
        aggregate(
          array_distinct(split($textColName, '\\\\s+')),
          array_repeat(0L, 64),
          (acc, t) -> zip_with(acc,
            transform(sequence(0, 63),
              j -> if((shiftright(xxhash64(t), j) & 1) = 1, 1L, -1L)),
            (x, y) -> x + y)),
        sequence(0, 63),
        (v, j) -> if(v > 0, shiftleft(1L, j), 0L)),
      0L, (acc, x) -> acc | x)""")

  /** SimHash near-dup pairs: 8×8-bit band join (pigeonhole guarantees
    * recall for Hamming ≤ 7), exact Hamming via bit_count(xor) ≤ 7. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 7): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash("text").as("sig"))
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 8).map { b =>
        shiftright(col("sig"), b * 8).bitwiseAND(0xFF)
      }: _*)).as(Seq("band_idx", "band_val")))
    val a = bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  val simhashNearDups: GraftQuery =
    GraftQuery.rowsOnly("ns_dedup_simhash")((s, d) => simhashPairs(s, d))

  /** Blocked exact n-gram Jaccard: block on (lang, length bucket) —
    * the classic blocking alternative to LSH when a cheap natural key
    * bounds the candidate set — then exact 3-shingle Jaccard within
    * blocks. */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("int").as("len_bucket"),
        shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val a = docs.select(col("lang"), col("len_bucket"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("lang"), col("len_bucket"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "len_bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("lang"), col("doc_a"), col("doc_b"), dround(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val ngramNearDups: GraftQuery =
    GraftQuery.rowsOnly("ns_dedup_ngram")((s, d) => ngramJaccardPairs(s, d))

  val all: Seq[GraftQuery] = Seq(exactDups, minhashNearDups, simhashNearDups, ngramNearDups)
}
