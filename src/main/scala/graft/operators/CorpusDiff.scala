package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Corpus SNAPSHOT DIFF — the version-to-version audit every managed
  * training corpus runs before promoting a new crawl: classify every
  * doc_id as `added` / `removed` / `changed` / `unchanged` between
  * two snapshots by content hash, and publish the per-source tally
  * that release notes and rollback decisions read. (Reference analog:
  * the lifecycle-event history D10 answers "what changed" for
  * pipeline runs; this answers it for the corpus itself.)
  *
  * Snapshots are derived deterministically from the one fixture
  * table so both engines see identical versions: v1 = docs with
  * `doc_id % 11 <> 3`; v2 = docs with `doc_id % 13 <> 5`, where docs
  * with `doc_id % 17 = 2` carry an edited body (a `#v2` marker
  * appended before hashing, so the edit changes content for ANY text) —
  * so all four statuses exercise at every SF.
  *
  * Scale shape: the content hash is computed AT THE SCAN (map-side
  * md5 — no column survives to the join but (doc_id, source, hash)),
  * and the diff is ONE full-outer equi-join on doc_id; snapshots
  * stored doc_id-sorted/bucketed join with zero exchange
  * ([[ScaleOps.writeBucketed]]), so diffing two 100 TB snapshots
  * costs two scans plus a co-partitioned merge — never a content
  * comparison (hash inequality ≡ content inequality at 2⁻¹²⁸). The
  * status tally partial-aggregates to |status|×|sources| rows per
  * task before the final tiny exchange.
  */
object CorpusDiff {

  /** (doc_id, source, h) for each snapshot side. */
  private def snapshots(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    val v1 = docs.where(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), col("source"), md5(col("text").cast("binary")).as("h"))
    // the synthetic v2 edit appends a marker before hashing so the
    // change is unconditionally content-changing — an upper(text)
    // edit would silently degrade to 'unchanged' for any fixture doc
    // with no lowercase letters
    val v2 = docs.where(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("source"),
        md5(when(col("doc_id") % 17 === 2, concat(col("text"), lit("#v2")))
          .otherwise(col("text")).cast("binary")).as("h"))
    (v1, v2)
  }

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = snapshots(spark, dir)
    // presence = an explicit MARKER column, never hash nullability
    // (r12 review: md5(NULL text) is NULL, so a NULL-text doc present
    // in both snapshots read as 'added' and a v1-only one as 'added'
    // too — and the oracle mirrored the defect, keeping the gate
    // green). Hash comparison is NULL-SAFE for the same reason:
    // NULL text vs real text is a content change; NULL vs NULL is not.
    v1.select(col("doc_id"), col("source").as("s1"), col("h").as("h1"), lit(true).as("p1"))
      .join(v2.select(col("doc_id"), col("source").as("s2"), col("h").as("h2"),
        lit(true).as("p2")), Seq("doc_id"), "full_outer")
      .select(coalesce(col("s2"), col("s1")).as("source"),
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "removed")
          .when(!(col("h1") <=> col("h2")), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status").agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  val diff: GraftQuery = GraftQuery.checked("ns_corpus_diff",
    """WITH v1 AS (
      SELECT doc_id, source, TRUE AS p, md5(text) AS h
      FROM documents WHERE doc_id % 11 <> 3),
    v2 AS (
      SELECT doc_id, source, TRUE AS p,
             md5(CASE WHEN doc_id % 17 = 2 THEN text || '#v2' ELSE text END) AS h
      FROM documents WHERE doc_id % 13 <> 5)
    SELECT COALESCE(v2.source, v1.source) AS source,
           CASE WHEN v1.p IS NULL THEN 'added'
                WHEN v2.p IS NULL THEN 'removed'
                WHEN v1.h IS DISTINCT FROM v2.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n_docs
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1, 2 ORDER BY source, status""")((s, d) => snapshotDiff(s, d))

  val all: Seq[GraftQuery] = Seq(diff)
}
