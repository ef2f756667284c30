package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping patterns the 100 TB deployment
  * leans on (builder brief "Partitioning & shuffle"). Each is a plain
  * plan transformation — usable on any DataFrame — with a spec
  * asserting its plan shape in ScaleOpsSpec.
  */
object ScaleOps {

  /** Skew-salted aggregation: two-phase groupBy for skewed keys.
    * Phase 1 groups on (key, salt) — spreading a hot key over
    * `saltBuckets` reducers — phase 2 merges the partials. Use for
    * algebraic aggregates (sum/count/min/max) when one key holds a
    * disproportionate share of rows and AQE's skew handling can't help
    * (it only splits skewed JOIN partitions, not aggregations).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pcount"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_pcount").as("n"))
  }

  /** Salted join: replicate the small side `saltBuckets` times and
    * salt the large side, so one hot key's rows spread across
    * reducers. For when the small side is too big to broadcast but the
    * join key is skewed. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<long>")))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a table bucketed by a join key so future equi-joins on that
    * key are co-located (no shuffle on the bucketed side). Bucketing
    * requires saveAsTable (metastore-tracked). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", s"spark-warehouse/$table")
      .saveAsTable(table)

  /** Z-ORDER (Morton) clustering key: interleaves the low `bits` bits
    * of two non-negative long columns (a at even positions, b at odd),
    * so sorting by the key clusters rows that are close in BOTH
    * dimensions — the multi-dimensional data-skipping layout
    * (Delta/Iceberg "OPTIMIZE ZORDER BY"): after
    * [[writeCurated]]-style sorted writes, parquet row-group min/max
    * zone maps prune range scans on EITHER column, where a plain sort
    * on one column leaves the other's ranges spanning every file.
    *
    * Pure integer bit algebra — one codegen'd expression, zero
    * shuffle, bit-identical on any engine (the oracle mirrors it as
    * explicit shift/mask terms). Caller contract: 0 ≤ a,b < 2^bits
    * (2·bits ≤ 62) — out-of-range bits are masked off, not an error,
    * matching the "clustering key, not an identity" role. */
  def zorderKey(a: Column, b: Column, bits: Int = 20): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** CURATED-CORPUS SINK: the layout contract for the training-data
    * output of the curation funnel. Hive-partitioned by `partCol`
    * (readers prune whole languages/sources from the path alone),
    * each file internally sorted by `sortCol` so parquet row-group
    * min/max zone maps make id-range scans sub-file-selective, and
    * `maxRecordsPerFile` caps file size so a whale partition splits
    * into bounded files instead of one unsplittable giant.
    *
    * Shuffle shape: ONE repartition on `partCol` (so each partition
    * value lands contiguously instead of every task writing a sliver
    * into every partition directory — the small-files explosion), then
    * an in-partition sort — no global sort, no driver involvement. At
    * 100 TB the repartition is the one unavoidable exchange; a skewed
    * partition value is handled by the file cap, not a straggler sort,
    * because sortWithinPartitions spills. */
  def writeCurated(df: DataFrame, path: String, partCol: String, sortCol: String,
                   maxRecordsPerFile: Int = 1000000): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(partCol, sortCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partCol)
      .parquet(path)

  // ---- atomic snapshot commit for the curated sink (r11 verdict ------
  // missing #4): at 100 TB an interrupted funnel re-run must leave the
  // PRIOR snapshot readable — plain overwrite-in-place has a window
  // where readers see a half-deleted, half-written directory.

  private val CurrentManifest = "_CURRENT"

  private def hadoopFs(df: DataFrame, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sessionState.newHadoopConf())

  /** The committed snapshot name (`snap-<n>`) a reader should load, or
    * None before the first commit. Reading the manifest is the ONLY
    * way into the sink — data directories are not self-describing. */
  def currentSnapshot(spark: org.apache.spark.sql.SparkSession, path: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val manifest = new org.apache.hadoop.fs.Path(path, CurrentManifest)
    val fs = manifest.getFileSystem(conf)
    if (!fs.exists(manifest)) None
    else {
      val in = fs.open(manifest)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Read the committed curated corpus — always the last PUBLISHED
    * snapshot, never an in-flight write. */
  def readCurated(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val snap = currentSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $path"))
    spark.read.parquet(s"$path/$snap")
  }

  /** ATOMIC-COMMIT [[writeCurated]]: write the full layout into a NEW
    * snapshot directory (`snap-<n+1>`), then publish it by renaming a
    * temp manifest over [[CurrentManifest]] — rename is the commit
    * primitive (atomic on HDFS and POSIX; on object stores front this
    * sink with a rename-atomic layer, the standard caveat). Contract:
    *
    *  - CRASH SAFETY: an interrupted write leaves a partial
    *    `snap-<n+1>` directory but the manifest still names
    *    `snap-<n>` — [[readCurated]] keeps serving the prior snapshot.
    *  - IDEMPOTENT RE-RUN: the retry targets the SAME `snap-<n+1>`
    *    (derived from the committed manifest, not from what's on
    *    disk) in overwrite mode, clobbering the partial attempt; only
    *    the manifest rename publishes.
    *  - RETENTION: after a successful commit the previous snapshot is
    *    kept (in-flight readers hold it open) and everything older is
    *    deleted — bounded storage, one-snapshot undo.
    *
    * Returns the committed snapshot name. */
  def writeCuratedAtomic(df: DataFrame, path: String, partCol: String, sortCol: String,
                         maxRecordsPerFile: Int = 1000000): String = {
    val fs = hadoopFs(df, path)
    val prior = currentSnapshot(df.sparkSession, path)
    val nextId = prior.map(_.stripPrefix("snap-").toLong + 1).getOrElse(1L)
    val snapName = s"snap-$nextId"
    writeCurated(df, s"$path/$snapName", partCol, sortCol, maxRecordsPerFile)
    // publish: temp manifest + atomic rename-overwrite
    val tmp = new org.apache.hadoop.fs.Path(path,
      s"$CurrentManifest.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(snapName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val manifest = new org.apache.hadoop.fs.Path(path, CurrentManifest)
    org.apache.hadoop.fs.FileContext.getFileContext(manifest.toUri,
        df.sparkSession.sessionState.newHadoopConf())
      .rename(tmp, manifest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // retention: keep the newly committed + the immediately prior;
    // also sweep tmp manifests a crashed commit left behind (they are
    // pre-rename droppings, never readable state). Single-writer
    // contract: concurrent writers would derive the same snap-<n+1>
    // and clobber each other mid-write — serialize re-runs externally
    // (the funnel scheduler's job), as with any snapshot sink.
    val keep = Set(snapName) ++ prior
    val base = new org.apache.hadoop.fs.Path(path)
    fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      val staleSnap = st.isDirectory && n.startsWith("snap-") && !keep(n)
      val staleTmp = !st.isDirectory && n.startsWith(s"$CurrentManifest.tmp-")
      if (staleSnap || staleTmp) {
        fs.delete(st.getPath, true)
        ()
      }
    }
    snapName
  }
}
