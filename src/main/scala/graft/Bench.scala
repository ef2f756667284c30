package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def loadavg1m: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Idle-bench discipline (BASELINE.md): readings taken under load are
    // not comparable across rounds (r6 verdict #1: loadavg 2.35 made three
    // unchanged operators read 1.4–5.9× above their idle claims). Wait up
    // to ~2 min for the box to go idle; if it never does, proceed but
    // stamp a loud warning into the artifact so the reader knows.
    var waited = 0
    while (loadavg1m > 1.0 && waited < 120) {
      System.err.println(f"[bench] loadavg1m=${loadavg1m}%.2f > 1.0 — waiting for idle (${waited}s)")
      Thread.sleep(10000); waited += 10
    }
    val startLoad = loadavg1m
    val loadWarning =
      if (startLoad > 1.0) s""","warning":"loadavg1m ${f"$startLoad%.2f"} > 1.0 at start after ${waited}s wait - timings not comparable to idle baselines""""
      else ""
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (scheduler, parquet metadata for every
    // table, codegen, fixture dataset machinery) so the first measured
    // queries don't absorb JVM + first-touch file-listing/footer costs;
    // queries run in sorted order for stable reports
    try {
      spark.range(1000).count()
      graft.meta.Fixtures.defsDS(spark).count()
      graft.sources.Tables.names.foreach(n =>
        graft.sources.Tables(spark, sfDir, n).count())
    } catch { case _: Throwable => () }
    // best-of-2 per query (the DuckDB baseline in BASELINE.md is best
    // of 3 on a warm process — symmetric methodology)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Load context in the artifact (r5 verdict #4, r6 verdict #1):
    // loadavg1m_start is the idle-discipline reading (taken BEFORE any
    // Spark work — the number to compare against the <1.0 bar);
    // loadavg1m (end) includes the bench's own local[32] load and is
    // recorded for continuity with earlier artifacts, which sampled
    // only at end and therefore partly self-reported.
    val load = loadavg1m
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg1m_start":$startLoad,"loadavg1m":$load$loadWarning}""")
    spark.stop()
  }
}
