package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.AnalyticsParts

/** sf1 head-to-head for the three `ns_parts_*` floor-class rows (r12
  * verdict #3: 7.3×/4.8×/4.8× DuckDB at sf0.1, all sub-second absolute
  * — the same shape g7/video_incremental had before the r11 sf1 route
  * closed them). The claim under test: the ratios are Spark's
  * per-query scheduling floor amortizing over fixture-sized inputs,
  * not plan defects, so they must collapse at real data sizes.
  *
  * Dataset: sf0.1 scaled 10× on the FACT side only — `lineitem`
  * cross-joined with a 10-row replica index (keys untouched), dims
  * (`part`, `supplier`, `nation`) copied verbatim. That is the honest
  * scale direction (facts grow, dims don't), and the small-qty
  * predicate `2·qty·n_l < sum_qty` is replication-invariant (both
  * sides scale by the same factor), so the queries stay semantically
  * identical. Both engines read the SAME parquet files; the DuckDB
  * side runs the registered oracle SQL over them
  * (tools/parts_headtohead.py, best-of-3 warm — the BASELINE.md
  * methodology). This tool also dumps the three oracle SQLs next to
  * the data so the python side needs no Verify run first.
  *
  * Run: `sbt "runMain graft.tools.PartsHeadToHead /tmp/graft_sf1_tpch"`
  * then `python3 tools/parts_headtohead.py /tmp/graft_sf1_tpch`.
  */
object PartsHeadToHead {
  val queries = Seq(
    AnalyticsParts.partsSmallQty, AnalyticsParts.partsProfit, AnalyticsParts.partsNamed)

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_tpch")
    val srcSf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val liPath = s"$dir/lineitem.parquet"
    if (!new java.io.File(liPath).exists()) {
      val li = spark.read.parquet(s"$srcSf/lineitem.parquet")
      li.crossJoin(spark.range(factor).toDF("rep")).drop("rep")
        .repartition(32).write.parquet(liPath)
      Seq("part", "supplier", "nation").foreach { t =>
        spark.read.parquet(s"$srcSf/$t.parquet").write.parquet(s"$dir/$t.parquet")
      }
      println(s"[parts-h2h] wrote ${factor}x $srcSf fact + dims to $dir")
    }
    // dump the oracle SQLs for the python side (same files, same SQL)
    val oracles = queries.map(q => s""""${q.name}": ${jstr(q.oracle.get)}""")
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "parts_oracle.json"),
      oracles.getBytes("UTF-8"))
    spark.range(1000).count() // scheduler warm-up
    val liRows = spark.read.parquet(liPath).count()
    for (q <- queries) {
      val (n1, cold) = time { q.run(spark, dir).count() }
      val warm = (0 until 3).map(_ => time { q.run(spark, dir).count() }._2).min
      println(f"[parts-h2h] ${q.name} dir=$dir lineitem_rows=$liRows%d out_rows=$n1%d " +
        f"cold=$cold%.2fs warm_best3=$warm%.2fs")
    }
    spark.stop()
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
