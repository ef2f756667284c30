package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{CorpusDiff, Dedup}
import graft.sources.Tables

/** Invariants of the corpus-versioning operators the count-oracle
  * can't state: split assignment must never separate a near-dup
  * cluster (the leakage property the operator exists for), and the
  * snapshot diff must partition the union keyset.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  test("leak-free split: no near-dup cluster straddles two splits") {
    // re-derive each doc's split exactly as the operator does, then
    // check every cluster maps to exactly one split
    val labels = Dedup.dedupClusters(spark, dir)
    val split = Tables.documents(spark, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("u", substring(md5(col("rep").cast("string").cast("binary")), 1, 8))
      .withColumn("split",
        when(col("u") < "cccccccc", "train")
          .when(col("u") < "e6666666", "val")
          .otherwise("test"))
    val straddling = split.where(col("cluster_id").isNotNull)
      .groupBy("cluster_id").agg(countDistinct("split").as("k"))
      .where(col("k") > 1).count()
    assert(straddling == 0, s"$straddling clusters leak across splits")
    // and multi-member clusters exist, else the property is vacuous
    val multi = labels.groupBy("cluster_id").count().where(col("count") > 1).count()
    assert(multi > 0, "fixture must contain multi-member near-dup clusters")
  }

  test("leak-free split conserves the corpus: split doc counts sum to |documents|") {
    val total = Dedup.leakFreeSplit(spark, dir)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, dir).count())
  }

  test("snapshot diff partitions the union keyset and exercises all four statuses") {
    val out = CorpusDiff.snapshotDiff(spark, dir)
    val byStatus = out.groupBy("status").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"),
      s"all four statuses must appear: $byStatus")
    // union keyset size: |v1 ∪ v2| computed independently
    val n = Tables.documents(spark, dir)
      .where(col("doc_id") % 11 =!= 3 || col("doc_id") % 13 =!= 5).count()
    assert(byStatus.values.sum == n, "statuses must partition v1 ∪ v2")
    // changed = docs present in BOTH snapshots whose v2 body was edited
    val changed = Tables.documents(spark, dir)
      .where(col("doc_id") % 11 =!= 3 && col("doc_id") % 13 =!= 5 &&
        col("doc_id") % 17 === 2).count()
    assert(byStatus("changed") == changed,
      s"changed=${byStatus("changed")}, expected $changed (the %17 edit set present in both)")
  }
}
