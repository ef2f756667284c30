package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Metadata-plane parquet utilities.
  *
  * `rowCounts` answers COUNT(*) from row-group metadata in the file
  * footers — O(data files), never O(rows). The file listing is driver-
  * side namenode metadata (cheap); the footer reads fan out as ONE
  * Spark job with a task per file batch, so counting a 100 TB /
  * million-file table costs a million ~8 KB footer reads spread over
  * the cluster, not a scan. This is the same footer-stats trick DuckDB
  * and parquet-tools use, expressed as a distributed job.
  *
  * (The pure-Catalyst alternative — DSv2 scan with
  * `PushedAggregation: [COUNT(*)]`, see `Analytics.tableCountsViaScan`
  * — produces the same numbers and is pinned in PlanShapeSpec; the
  * union-of-N-subqueries plan it needs schedules its branches
  * sequentially on the driver, so the single fused job here is the
  * faster shape when counting many tables at once.)
  */
object ParquetMeta {

  /** Every PATH SEGMENT must be visible, not just the leaf name: a
    * recursive listing surfaces files under `_temporary/` or
    * `.staging/` (crashed-write leftovers) whose leaf names look like
    * data — Spark/DuckDB readers skip the whole hidden subtree, and
    * counting them broke the footer-count == scan-count equivalence
    * (r7 review). */
  /** `root` MUST be fully qualified (`fs.makeQualified`) — the
    * listing iterator yields qualified paths, and an unqualified or
    * relative root would never compare equal to any ancestor, making
    * the walk run past the root up to `/` and silently hide every file
    * under a dotted/underscored ancestor directory (row count 0; r7
    * advice). [[rowCounts]] qualifies before calling. */
  private def isDataFile(root: Path, p: Path): Boolean = {
    var cur = p
    // walk only the segments BELOW the listed root — the root itself
    // may legitimately live under a dotted directory. Path.equals
    // compares full URIs, sound here because both sides carry the same
    // FileSystem qualification.
    while (cur != null && cur != root && cur.getName.nonEmpty) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) return false
      cur = cur.getParent
    }
    true
  }

  /** (table, path) pairs → one row (tbl, n) per table, n = footer row
    * count. `paths` may be files or directories (listed recursively). */
  def rowCounts(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val hconf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val files: Seq[(String, String)] = tables.flatMap { case (tbl, p) =>
      val rawPath = new Path(p)
      val fs = rawPath.getFileSystem(hconf.value)
      // qualify BEFORE comparing ancestors: the iterator yields fully-
      // qualified paths, so a relative/unqualified root would never
      // match and the walk would inspect segments up to '/' (r7 advice)
      val path = fs.makeQualified(rawPath)
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && isDataFile(path, f.getPath))
          buf += ((tbl, f.getPath.toString))
      }
      buf.toSeq
    }
    val bconf = spark.sparkContext.broadcast(hconf)
    val counted = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .map { case (tbl, file) =>
        val footer = ParquetFileReader.readFooter(
          bconf.value.value, new Path(file), ParquetMetadataConverter.NO_FILTER)
        (tbl, footer.getBlocks.asScala.map(_.getRowCount).sum)
      }
      .toDF("tbl", "n0")
      .groupBy("tbl").agg(sum("n0").as("n"))
    // a table with zero data files must still count as 0 (COUNT(*) of an
    // empty relation is a row, not an absence)
    spark.createDataset(tables.map(_._1)).toDF("tbl")
      .join(counted, Seq("tbl"), "left")
      .na.fill(0L, Seq("n"))
  }
}
