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

  test("leak-free split: no near-dup cluster OR verified pair straddles splits") {
    // through the PRODUCT path (r12: Dedup.splitAssignments is the
    // factored per-doc frame the aggregate rides — this test used to
    // carry a token-for-token copy of the assignment logic, which
    // could drift from what the operator actually does)
    val split = Dedup.splitAssignments(spark, dir)
    val straddling = split.where(col("cluster_id").isNotNull)
      .groupBy("cluster_id").agg(countDistinct("split").as("k"))
      .where(col("k") > 1).count()
    assert(straddling == 0, s"$straddling clusters leak across splits")
    // per-PAIR form of the same property (tests the CC + assignment
    // COMPOSITION: a propagation bug that splits one true component
    // into two labels passes the cluster-level check but fails here)
    val asg = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.ngramJaccardPairs(spark, dir, 0.4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must carry near-dup pairs for the property to bite")
    pairs.foreach { case (a, b) =>
      assert(asg(a) == asg(b), s"pair ($a,$b) straddles: ${asg(a)} vs ${asg(b)}")
    }
    // non-degenerate 80/10/10: all three splits populated, train majority
    val tally = asg.valuesIterator.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    assert(tally.keySet == Set("train", "val", "test"), s"splits: ${tally.keySet}")
    val trainFrac = tally("train").toDouble / asg.size
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac out of band for 0.8")
    // and multi-member clusters exist, else the property is vacuous
    val labels = Dedup.dedupClusters(spark, dir)
    val multi = labels.groupBy("cluster_id").count().where(col("count") > 1).count()
    assert(multi > 0, "fixture must contain multi-member near-dup clusters")
  }

  test("keep-best survivor: keeper is a member with the cluster's max quality, min-id on ties") {
    val out = Dedup.keepBest.run(spark, dir).collect()
    assert(out.nonEmpty)
    val labels = Dedup.dedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = graft.operators.TextOps.qualityFrame(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.length == byCluster.size, "one row per cluster")
    out.foreach { r =>
      val (cid, n, keep, kq) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val members = byCluster(cid)
      assert(n == members.size)
      assert(members(keep), s"keeper $keep not a member of cluster $cid")
      val maxQ = members.map(quality).max
      assert(kq == maxQ, s"cluster $cid keeper quality $kq != max $maxQ")
      // min-id among the max-quality members (the deterministic tie-break)
      assert(keep == members.filter(m => quality(m) == maxQ).min,
        s"cluster $cid tie-break: keeper $keep")
    }
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
