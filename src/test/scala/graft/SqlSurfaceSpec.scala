package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftSql

/** SQL-only access to the operator library (r6 verdict #5): after
  * [[GraftSql.register]], a `spark.sql` user reaches any registered
  * operator via the `graft('name', dir)` table function, parameterized
  * cores via their own TVFs, and chosen results via `graft_<name>`
  * views — with results IDENTICAL to the Scala path (the same logical
  * plan inlines), and Catalyst optimizing THROUGH the SQL boundary
  * (pushdown proof below).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSuite.spark
    GraftSql.register(s)
    GraftSql.registerTables(s, SparkSuite.sfDir)
    s
  }
  private val dir = SparkSuite.sfDir

  /** 12 operators spanning the families: metadata-plane k-queries,
    * text stats, dedup, vectors, events. */
  private val names = Seq(
    "k01_table_counts", "k02_prefix_headers", "k05_downstream",
    "k07_concurrency_gate", "ns_text_stats", "ns_text_token_counts",
    "ns_text_lang_stats", "ns_dedup_exact", "ns_vec_norms",
    "ns_events_cdc_merge", "ns_text_quality_filter", "ns_corpus_diff")

  names.foreach { name =>
    test(s"SQL-only access: graft('$name') == Scala path") {
      val viaSql = spark.sql(s"SELECT * FROM graft('$name', '$dir')")
      val direct = SparkEntry.queries(name)(spark, dir)
      assert(viaSql.columns.toSeq == direct.columns.toSeq)
      assert(viaSql.collect().map(_.toString).toSeq ==
        direct.collect().map(_.toString).toSeq,
        s"$name diverged between SQL and Scala access")
    }
  }

  test("graft_catalog(): SQL users can discover the registry") {
    val rows = spark.sql(
      "SELECT * FROM graft_catalog() WHERE oracle_checked ORDER BY name").collect()
    assert(rows.length == SparkEntry.oracleSql.size)
    assert(spark.sql("SELECT COUNT(*) FROM graft_catalog()").head().getLong(0) ==
      SparkEntry.registry.size)
  }

  test("unknown query name fails loudly") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft('no_such_query', '$dir')").collect()
    }
    assert(e.getMessage.contains("no_such_query"))
  }

  test("parameterized TVF: graft_cdc_merge honors its cutoff argument") {
    val late = spark.sql(
      s"SELECT * FROM graft_cdc_merge('$dir', '2024-02-15 00:00:00')").collect()
    val default = spark.sql(
      s"SELECT * FROM graft_cdc_merge('$dir', '2024-01-16 00:00:00')").collect()
    assert(default.map(_.toString).toSeq ==
      graft.operators.EventCdc.cdcMerge(spark, dir).collect().map(_.toString).toSeq)
    // a post-log cutoff puts the whole log in the snapshot: every
    // action flips to 'keep' (mid-log, the fixture reads 'update')
    assert(late.nonEmpty && late.forall(_.getString(4) == "keep"),
      "post-log cutoff must classify every row as snapshot-kept")
    assert(default.exists(_.getString(4) != "keep"),
      "cutoff argument must change the merge")
  }

  test("cdc cutoff accepts every Spark-castable timestamp form, rejects garbage at the boundary (r12 advice)") {
    // the boundary validator must match downstream CAST(… AS TIMESTAMP)
    // semantics — the first cut whitelisted three JDK parsers and
    // rejected Spark-legal forms like ISO 'T' datetimes and
    // minutes-precision strings
    val sparkLegal = Seq(
      "2024-01-16T00:00:00",     // ISO local datetime (T separator)
      "2024-01-16 00:00",        // minutes precision
      "2024-01-16",              // date only
      "2024-01-16T00:00:00Z",    // instant
      "2024-01-16 00:00:00.123") // fractional seconds
    sparkLegal.foreach { c =>
      val rows = graft.operators.EventCdc.cdcMergeAt(spark, dir, c).limit(1).collect()
      assert(rows.nonEmpty, s"Spark-castable cutoff '$c' must be accepted")
    }
    // equal instants must produce identical merges regardless of spelling
    val a = graft.operators.EventCdc.cdcMergeAt(spark, dir, "2024-01-16T00:00:00")
      .collect().map(_.toString).toSeq
    val b = graft.operators.EventCdc.cdcMergeAt(spark, dir, "2024-01-16 00:00:00")
      .collect().map(_.toString).toSeq
    assert(a == b, "ISO-T and space spellings of the same instant must merge identically")
    val e = intercept[IllegalArgumentException] {
      graft.operators.EventCdc.cdcMergeAt(spark, dir, "not-a-time")
    }
    assert(e.getMessage.contains("not-a-time"))
  }

  test("parameterized TVF: graft_topk(k) controls the neighbor count") {
    val k3 = spark.sql(s"SELECT * FROM graft_topk('$dir', 2, 3)")
    val counts = k3.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 2 && counts.forall(_ == 3L))
  }

  test("SQL composes ACROSS operators: join two graft tables with a base view") {
    val joined = spark.sql(
      s"""SELECT s.lang, COUNT(*) AS n_kept, SUM(t.n_bpe_tokens) AS toks
         FROM graft('ns_text_quality_filter', '$dir') q
         JOIN graft('ns_text_stats', '$dir') s ON q.doc_id = s.doc_id
         JOIN graft('ns_text_token_counts', '$dir') t ON q.doc_id = t.doc_id
         WHERE q.keep = 1
         GROUP BY s.lang ORDER BY s.lang""")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }

  test("Catalyst optimizes THROUGH the SQL boundary: filter pushed to the parquet scan") {
    val df = spark.sql(
      s"SELECT doc_id, n_bpe_tokens FROM graft('ns_text_token_counts', '$dir') WHERE doc_id < 10")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,10)"),
      s"doc_id predicate must reach the scan:\n${plan.take(3000)}")
    assert(df.count() == 10)
  }

  test("operator views: graft_<name> temp views serve plain SQL") {
    GraftSql.registerViews(spark, dir, Seq("ns_dedup_exact", "ns_vec_norms"))
    assert(spark.sql("SELECT * FROM graft_ns_dedup_exact").count() ==
      SparkEntry.queries("ns_dedup_exact")(spark, dir).count())
    assert(spark.sql("SELECT COUNT(*) FROM graft_ns_vec_norms").collect()(0).getLong(0) > 0)
  }

  test("capstone through the TVF: the corpus curation funnel serves SQL dashboards") {
    // the r11 corpus-wide funnel (six composed operators, three
    // modalities of real decoded media behind it) answers a plain SQL
    // question — per-modality survival rate — through the same
    // graft() boundary as any other operator, and the outer filter/agg
    // compose with the inlined plan
    val rates = spark.sql(
      s"""SELECT modality,
             SUM(CASE WHEN stage = 'kept' THEN n ELSE 0 END) AS n_kept,
             SUM(n) AS n_total
         FROM graft('ns_mm_corpus_funnel', '$dir')
         GROUP BY modality ORDER BY modality""").collect()
    assert(rates.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    rates.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(1) > 0 && r.getLong(1) < r.getLong(2),
        s"survival rate must be non-trivial per modality: $r")
    }
  }

  test("TVF literal rendering: DATE cutoff works, NULL cutoff and missing args fail NAMED (r12 review)") {
    // DATE literal: internally an Int of epoch DAYS — the same
    // raw-internal-value trap as TIMESTAMP micros; pre-fix it rendered
    // "19737", the downstream cast('timestamp') yielded NULL and the
    // cutoff filter silently emptied the result
    val viaDate = spark.sql(
      s"SELECT COUNT(*) FROM graft_cdc_merge('$dir', DATE'2024-06-01')").collect()(0).getLong(0)
    val viaTs = spark.sql(
      s"SELECT COUNT(*) FROM graft_cdc_merge('$dir', TIMESTAMP'2024-06-01 00:00:00')")
      .collect()(0).getLong(0)
    assert(viaDate > 0, "DATE cutoff must not silently empty the merge")
    assert(viaDate == viaTs, s"DATE'2024-06-01' ($viaDate) must equal its midnight TIMESTAMP ($viaTs)")
    // NULL cutoff: pre-fix, null unboxed to 0L -> cutoff silently
    // pinned to 1970 — now a named analysis error
    val eNull = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_cdc_merge('$dir', CAST(NULL AS TIMESTAMP))").collect()
    }
    assert(eNull.getMessage.contains("non-NULL"), s"named null error, got: ${eNull.getMessage.take(200)}")
    // scalar-function arity: the shared check names the function and
    // usage instead of an opaque IndexOutOfBoundsException (pre-fix
    // only shingle_hashes had it). Self-register: this test must not
    // depend on suite ordering for the function registry.
    graft.plans.GraftFunctions.register(spark)
    val eArity = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0f))").collect()
    }
    assert(eArity.getMessage.contains("vec_dot: expected 2 argument"),
      s"named arity error, got: ${eArity.getMessage.take(200)}")
  }
}
