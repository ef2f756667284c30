package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** The end-to-end corpus-curation pipeline (north-star capstone): the
  * sequence every training-data ingest runs —
  *
  *   quality gate → PII redaction → content fingerprint → exact dedup
  *
  * — expressed ONCE as a composable column pipeline and reused by both
  * the batch query (`ns_curation`, oracle-checked) and the streaming
  * ingest ([[graft.streaming.GraftStream]]-style `readStream` +
  * `dropDuplicatesWithinWatermark`, spec'd equivalent to the batch
  * keep-first semantics). Every stage is codegen'd column algebra that
  * pipelines into the scan; the only shuffle is the dedup (hash on
  * fingerprint), so at 100 TB the pipeline is one pass + one
  * fingerprint-partitioned exchange.
  */
object Curation {

  val MinTokens = 5

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  def redacted(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), "[0-9]+", "<NUM>")

  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Stages shared verbatim by batch and streaming: filter short docs,
    * redact, fingerprint. (Dedup differs: batch keeps min doc_id per
    * fingerprint; streaming keeps first-seen within the watermark.) */
  def prepare(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .where(col("n_tokens") >= MinTokens)
      .withColumn("text", redacted(col("text")))
      .withColumn("fp", fingerprint(col("text")))

  /** Batch curation: prepare + keep the smallest doc_id per fingerprint. */
  def curate(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    prepare(docs)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("doc_id", "lang", "n_tokens", "fp")
  }

  val curation: GraftQuery = GraftQuery.checked("ns_curation",
    """WITH base AS (
      SELECT doc_id, lang,
             regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
               '[0-9]+', '<NUM>', 'g') AS rtext,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
      FROM documents),
    prepared AS (
      SELECT doc_id, lang, n_tokens,
             md5(lower(regexp_replace(rtext, '\s+', ' ', 'g'))) AS fp
      FROM base WHERE n_tokens >= 5),
    deduped AS (
      SELECT doc_id, lang, n_tokens, fp,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM prepared)
    SELECT doc_id, lang, n_tokens, fp FROM deduped WHERE rn = 1
    ORDER BY doc_id""") { (spark, dir) =>
    curate(Tables.documents(spark, dir)).orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(curation)
}
