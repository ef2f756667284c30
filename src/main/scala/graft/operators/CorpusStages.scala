package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** STAGE MATERIALIZERS — curation stages whose OUTPUT is itself a
  * `documents` table, so each one's parquet can be the next stage's
  * input corpus. These are what make the data-plane DAG composable:
  * a def chain
  *
  * {{{
  * quality-docs:  graft-query ns_stage_quality_docs <corpus> <out1> documents
  * dedup-docs:    graft-query ns_stage_dedup_docs graft-run:<out1> <out2> documents
  * pack-report:   graft-query ns_text_pack        graft-run:<out2> <out3>
  * }}}
  *
  * runs the reference's core semantic — success-triggered pipelines
  * passing real artifacts downstream
  * (`/root/reference/src/kalytical/core/dispatcher.py:31-46`) — with
  * each stage a registered, oracle-checked operator
  * (GraftServiceSpec's chained-DAG e2e drives exactly this chain).
  *
  * The aggregate twins of these stages ([[graft.operators.Curation]]'s
  * funnel counts, `ns_dedup_exact`'s group inventory) answer "what
  * would the stage do"; the materializers DO it — the distinction a
  * 100 TB pipeline cares about, since the materialized form is what
  * feeds training.
  */
object CorpusStages {

  /** Shared with `ns_text_quality_filter` / `ns_mm_paired_gate`: the
    * four-rule C4-style keep gate, emitted as the surviving rows in
    * full documents schema. Thresholds and the stopword list are
    * INTERPOLATED from TextOps' single definitions (r12 review: this
    * string re-inlined the five r10-centralized constants, so tuning
    * `QMinTokens` would have updated qualityFilter's BOTH sides and
    * this operator's Spark side while its oracle stayed at the old
    * literal — red only at the next DuckDB gate run). */
  private val gateSql =
    s"""WITH b AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             (CAST(n_chars AS DOUBLE) - len(toks) + 1) / len(toks) AS awl,
             CAST(len(list_filter(toks, w -> w IN (${TextOps.stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
               / len(toks) AS stop_ratio,
             CASE WHEN len(toks) > 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) / (len(toks) - 2)
                  ELSE 1.0 END AS rep_frac
      FROM (SELECT doc_id, n_chars,
              list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS toks
            FROM documents)),
    gate AS (
      SELECT doc_id FROM b
      WHERE n_tokens >= ${TextOps.QMinTokens} AND awl >= ${TextOps.QAwlMin} AND awl <= ${TextOps.QAwlMax}
        AND stop_ratio >= ${TextOps.QStopMin} AND rep_frac <= ${TextOps.QRepMax})"""

  /** Stage 1: the CURATED corpus — documents passing the quality gate,
    * full schema preserved. ONE map-side predicate over the scan
    * ([[TextOps.qualityKeep]] — the exact composite gate
    * `qualityFilter` verdicts with; r12 review: the first cut ran the
    * FULL qualityFilter operator — reason strings, per-doc signal
    * frame, its own orderBy — then joined the survivors back by
    * doc_id, paying a second corpus aggregation plus a shuffle for a
    * filter the predicate computes in place). */
  val qualityDocs: GraftQuery = GraftQuery.checked("ns_stage_quality_docs",
    gateSql + """
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d JOIN gate USING (doc_id)
    ORDER BY doc_id""") { (spark, dir) =>
    Tables.documents(spark, dir)
      .where(TextOps.qualityKeep(col("text"), col("n_chars")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Stage 2: EXACT-DEDUP survivors — first (lowest doc_id) copy of
    * each distinct text, full schema preserved. Scale: group on the
    * 128-bit text digest (never the text itself — the shuffle moves
    * 16-byte keys, not documents), min-reduce with map-side partials,
    * then an id-keyed semi join back; no window over the corpus. */
  val dedupDocs: GraftQuery = GraftQuery.checked("ns_stage_dedup_docs",
    """SELECT doc_id, text, lang, source, n_chars
    FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
          FROM documents)
    WHERE doc_id = keeper
    ORDER BY doc_id""") { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(keepers, Seq("doc_id"), "left_semi")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(qualityDocs, dedupDocs)
}
