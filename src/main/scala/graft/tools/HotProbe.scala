package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase decomposition for the two CPU-heaviest bench rows
  * (`ns_dedup_simhash_sound`, `ns_text_perceptron`) — times each
  * internal stage separately on a memo-warm session so the r15
  * optimization round attacks the measured cost, not the assumed one.
  *
  * Run: `sbt "runMain graft.tools.HotProbe"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object HotProbe {
  private def time(label: String)(f: => Long): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[hot-probe] $label%-40s best3=${ts.map(_._1).min}%.3f all=${ts.map(t => f"${t._1}%.3f").mkString(",")} rows=${ts.head._2}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      // match the bench session (r15): AQE off by default locally, same knob
      .config("spark.sql.adaptive.enabled",
        sys.props.get("SPARK_GRAFT_AQE").orElse(sys.env.get("SPARK_GRAFT_AQE")).getOrElse("false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000).count()
      graft.sources.Tables.names.foreach(n => graft.sources.Tables(spark, sfDir, n).count())
    } catch { case _: Throwable => () }

    // ---- simhash_sound decomposition -------------------------------
    import graft.operators.Dedup
    // warm the pairs memo first (paid once per session, like the bench)
    Dedup.simhashPairs(spark, sfDir).count()
    time("simhash: emitted pairs (memo scan)") {
      Dedup.simhashPairs(spark, sfDir)
        .groupBy("doc_a", "doc_b").agg(count(lit(1))).count()
    }
    val pairDocs = Dedup.simhashPairs(spark, sfDir)
      .select(col("doc_a").as("doc_id"))
      .unionByName(Dedup.simhashPairs(spark, sfDir).select(col("doc_b").as("doc_id")))
      .distinct()
    time("simhash: pairDocs distinct")(pairDocs.count())
    time("simhash: agg sigs (semi bcast)") {
      Dedup.simhashSignaturesAggOf(
        graft.sources.Tables.documents(spark, sfDir)
          .join(broadcast(pairDocs), Seq("doc_id"), "left_semi")).count()
    }
    time("simhash: agg sigs (no semi, full)") {
      Dedup.simhashSignaturesAggOf(
        graft.sources.Tables.documents(spark, sfDir)).count()
    }
    time("simhash: full violations") {
      Dedup.simhashViolations(spark, sfDir).count()
    }

    // ---- perceptron decomposition ----------------------------------
    import graft.operators.TextClassify
    val dv = graft.operators.OpMemo.cached(spark, sfDir, "perceptron-docvec") {
      TextClassify.docVectors(graft.sources.Tables.documents(spark, sfDir))
    }
    time("perceptron: dv memo count")(dv.count())
    val wArr = lit(Array.fill(256)(0L))
    time("perceptron: one iter (dot+filter)") {
      dv.withColumn("margin",
          graft.functions.VectorExpressions.sparseCountDot(col("fs"), wArr))
        .where(col("y") * col("margin") <= 0).count()
    }
    time("perceptron: one iter (full update)") {
      val miscl = dv.withColumn("margin",
          graft.functions.VectorExpressions.sparseCountDot(col("fs"), wArr))
        .where(col("y") * col("margin") <= 0)
      miscl.select(col("y"), explode(concat(col("fs"),
          array(struct(lit(-1).as("f"), lit(1L).as("cnt"))))).as("e"))
        .groupBy(col("e.f").as("f"))
        .agg(sum(col("y") * col("e.cnt")).as("u"), count(lit(1)).as("n"))
        .collect().length.toLong
    }
    time("perceptron: full 8-iter query") {
      graft.SparkEntry.queries("ns_text_perceptron")(spark, sfDir).count()
    }
    spark.stop()
  }
}
