package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  /** Temp dir that is recursively deleted when the test JVM exits —
    * specs that write parquet/checkpoints use this instead of a bare
    * `Files.createTempDirectory`, which would accumulate data across
    * test runs (r6 advice on ScaleOpsSpec's DPP test). */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      } catch { case _: Throwable => () }
    }))
    p.toString
  }
}
