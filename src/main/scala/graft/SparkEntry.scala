package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented operator, each a named deterministic query. */
  val registry: Seq[GraftQuery] =
    Analytics.all ++ MetaQueries.all ++ TextOps.all ++ Dedup.all ++
      Vectors.all ++ VectorsIvf.all ++ VectorsKmeans.all ++ Multimodal.all ++
      Analytics2.all ++ Curation.all ++ EventOps.all ++ TextPmi.all ++
      VectorsPca.all ++ EventStats.all ++ TextBpe.all ++ TextFuzzy.all ++
      VectorsPq.all ++ VectorsCoreset.all ++ EventCdc.all ++ TextClassify.all ++
      CorpusDiff.all ++ TimeSeries.all ++ VectorsCuration.all ++
      TextSelection.all ++ VectorsMining.all ++ TextSafety.all ++ CorpusStages.all ++
      VectorsPlanted.all ++ RecallReport.all ++ AnalyticsParts.all

  require(registry.map(_.name).distinct.size == registry.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The round-4 capstone: the full corpus-assembly funnel
    * (quality gate → near-dup dedup → eval decontamination → token
    * budget per language) — the engine's own surface, not a TPC-H
    * shape. */
  def entry(spark: SparkSession): DataFrame =
    Curation.funnel.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
