package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whale-digest probe for `ns_text_chunk_dedup`'s plan choice
  * (results → BASELINE.md): canonical-copy selection via the
  * partial-combining min-struct AGGREGATE vs the `row_number() OVER
  * (PARTITION BY digest)` window, on a corpus where ONE boilerplate
  * digest holds 5M of 10M chunk occurrences — the skew regime a real
  * RAG store hits with templated spans. The aggregate partial-combines
  * the whale map-side (one row per task crosses the wire); the window
  * must shuffle AND SORT all 5M whale rows into one partition.
  *
  * Run: `sbt "runMain graft.tools.ChunkDedupProbe"`
  */
object ChunkDedupProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** 10M chunk occurrences: half one boilerplate digest, half unique. */
  private def synthChunks(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"), lit("en").as("lang"), (col("id") % 7L).as("chunk_idx"),
      when(col("id") % 2 === 0, lit("BOILERPLATE"))
        .otherwise(md5(col("id").cast("string").cast("binary"))).as("chunk_md5"))

  private def viaAggregate(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_md5")
      .agg(min(struct(col("doc_id"), col("chunk_idx"), col("lang"))).as("m"),
        count(lit(1)).as("copies"))
      .select(col("m.lang").as("lang"), col("copies"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"), sum("copies").as("n_chunks"))

  private def viaWindow(chunks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    chunks.withColumn("rn", row_number().over(w))
      .groupBy("lang").agg(
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        count(lit(1)).as("n_chunks"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val chunks = synthChunks(spark, 10000000L).cache()
    chunks.count()
    val (_, warmA) = time(viaAggregate(chunks).collect())
    val (a, tA) = time(viaAggregate(chunks).collect())
    val (_, warmW) = time(viaWindow(chunks).collect())
    val (w, tW) = time(viaWindow(chunks).collect())
    require(a.map(_.toString).sorted.sameElements(w.map(_.toString).sorted),
      s"formulations disagree: ${a.mkString} vs ${w.mkString}")
    println(f"chunk_dedup whale probe (10M occurrences, one 5M-copy digest): " +
      f"aggregate $tA%.2f s (warm $warmA%.2f) vs window $tW%.2f s (warm $warmW%.2f) " +
      f"-> ${tW / tA}%.1f x")
    spark.stop()
  }
}
