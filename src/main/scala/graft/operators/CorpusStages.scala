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
    * full documents schema. */
  private val gateSql =
    """WITH b AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             (CAST(n_chars AS DOUBLE) - len(toks) + 1) / len(toks) AS awl,
             CAST(len(list_filter(toks, w -> w IN ('the', 'a', 'an', 'of', 'to', 'and', 'in', 'is'))) AS DOUBLE)
               / len(toks) AS stop_ratio,
             CASE WHEN len(toks) > 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) / (len(toks) - 2)
                  ELSE 1.0 END AS rep_frac
      FROM (SELECT doc_id, n_chars,
              list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS toks
            FROM documents)),
    gate AS (
      SELECT doc_id FROM b
      WHERE n_tokens >= 40 AND awl >= 3.0 AND awl <= 10.0
        AND stop_ratio >= 0.01 AND rep_frac <= 0.2)"""

  /** Stage 1: the CURATED corpus — documents passing the quality gate,
    * full schema preserved. Scale: the gate is [[TextOps.qualityFilter]]'s
    * map-only scoring pass; the survivor join is doc_id-keyed equi
    * (id-bucketed at rest → exchange-free under the
    * [[ScaleOps.writeBucketed]] layout). */
  val qualityDocs: GraftQuery = GraftQuery.checked("ns_stage_quality_docs",
    gateSql + """
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d JOIN gate USING (doc_id)
    ORDER BY doc_id""") { (spark, dir) =>
    val gate = TextOps.qualityFilter.run(spark, dir)
      .where(col("keep") === 1).select("doc_id")
    Tables.documents(spark, dir)
      .join(gate, Seq("doc_id"))
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
