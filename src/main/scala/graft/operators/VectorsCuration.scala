package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** EMBEDDING-CURATION CAPSTONE — the embedding-side sibling of the
  * text funnel capstones (`ns_curation`/`ns_pipeline_funnel`): the
  * two-stage selection a vector corpus actually ships through before
  * training — (1) [[VectorsKmeans.semDedup]] REMOVES semantic
  * near-duplicates (Abbas et al. 2023: within-cluster cosine,
  * keep-first), then (2) [[VectorsCoreset]]'s greedy k-center
  * SELECTION picks K coverage-preserving representatives from the
  * SURVIVORS (Gonzalez 1985 farthest-point sampling) — redundancy
  * removal followed by diversity selection, each stage already
  * individually oracle-gated, here composed end-to-end under ONE
  * hash-matched oracle (the DuckDB replay chains the k-means
  * training + assignment + pair-scan CTEs into the survivor-filtered
  * greedy unroll — both stage oracles' SQL verbatim, so the
  * composition cannot drift from its parts).
  *
  * Scale shape is the union of its parts': dedup is one cluster-keyed
  * shuffle with salt-split whales; the survivor filter is a
  * broadcast-able anti-join on the (dedup-output-sized) dropped set;
  * selection is K scan-fused map rounds with model-sized driver
  * state. Nothing new moves at 100 TB that the parts didn't already
  * move.
  */
object VectorsCuration {

  def curationDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dropped = VectorsKmeans.semDedup(spark, dir).select("vec_id")
    val q = OpMemo.cached(spark, dir, "vec_curation_quant") {
      Tables.embeddings(spark, dir)
        .join(dropped, Seq("vec_id"), "left_anti")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 10000.0 + 0.5).cast("long")).as("qv"))
    }
    VectorsCoreset.selectFrom(q)
      .map { case (r, id, d, _) => (r, id, d) }
      .toDF("sel_rank", "vec_id", "dist_q2")
      .orderBy("sel_rank")
  }

  val curation: GraftQuery = GraftQuery.checked("ns_vec_curation",
    s"""WITH ${VectorsKmeans.semdedupSqlBody},
    dropped AS (
      SELECT DISTINCT vec_id FROM pairs WHERE sim_r >= ${VectorsKmeans.Tau}),
    q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id NOT IN (SELECT vec_id FROM dropped)),
    ${VectorsCoreset.greedySqlTail(VectorsCoreset.K)}""")((s, d) => curationDf(s, d))

  val all: Seq[GraftQuery] = Seq(curation)
}
