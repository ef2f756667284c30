package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.dround
import graft.GraftQuery.checked
import graft.sources.Tables

/** Analytics-parity operators (SURVEY §2.c K1, K19–K23).
  *
  * All plans are declarative DataFrame chains so Catalyst handles
  * pushdown/pruning; at 100 TB these become shuffle hash / sort-merge
  * aggregations with map-side partials, and the dimension joins in
  * [[revenueByNation]] broadcast (nation/region are tiny at any scale).
  */
object Analytics {

  /** K1 — per-table row counts, answered from parquet footer metadata
    * as one distributed job ([[graft.sources.ParquetMeta.rowCounts]]):
    * O(data files), never O(rows), which is the only COUNT(*) shape
    * that survives 100 TB. */
  val tableCounts: GraftQuery = checked("k01_table_counts",
    Tables.names.map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY tbl")) { (spark, dir) =>
    graft.sources.ParquetMeta.rowCounts(
      spark, Tables.names.map(n => n -> Tables.path(dir, n)))
      .orderBy("tbl")
  }

  /** The pure-Catalyst formulation of K1: DSv2 parquet scans with
    * `PushedAggregation: [COUNT(*)]` (plan pinned in PlanShapeSpec;
    * equivalence with the footer job asserted in ScaleOpsSpec). The
    * conf flip is scoped — the v1/v2 choice binds when `spark.read`
    * resolves, so it never leaks into other plans. */
  def tableCountsViaScan(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,parquet,text")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // legacy NANOS events footer (pre-r5 testdata; harmless on MICROS)
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      Tables.names.map { n =>
        // raw reads: COUNT(*) needs no column transforms, and a bare
        // Aggregate-over-scan is the shape the v2 pushdown rule matches
        spark.read.parquet(Tables.path(dir, n))
          .agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), col("n"))
      }.reduce(_.unionByName(_)).orderBy("tbl")
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
  }

  /** K19 — TPC-H Q1-shaped pricing summary. Partial (map-side) + final
    * hash aggregation over 6 groups; the shipdate predicate pushes down
    * to the parquet scan. */
  val pricingSummary: GraftQuery = checked("k19_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 2) AS avg_qty,
      ROUND(AVG(l_extendedprice), 2) AS avg_price,
      ROUND(AVG(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus""") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= expr("TIMESTAMP '1998-09-02 00:00:00'"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dround(sum("l_quantity"), 2).as("sum_qty"),
        dround(sum("l_extendedprice"), 2).as("sum_base_price"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        dround(avg("l_quantity"), 2).as("avg_qty"),
        dround(avg("l_extendedprice"), 2).as("avg_price"),
        dround(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** K20 — revenue per nation (TPC-H Q5 shape). Fact-fact join
    * (orders⋈lineitem) shuffles on the order key; all dimensions
    * (customer at this scale is borderline — nation/region always)
    * broadcast. AQE handles skew at scale. */
  val revenueByNation: GraftQuery = checked("k20_revenue_by_nation",
    """SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY n.n_name""") { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
             col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
    val l = Tables.lineitem(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** K21 — top-3 orders by totalprice per priority: ranking window,
    * planned as WindowExec after a shuffle on o_orderpriority (5
    * partitions — at scale a TopK-per-group via partial limit would be
    * the optimization; row_number + filter lets Spark's
    * WindowGroupLimit push the limit below the sort). */
  val topOrdersPerPriority: GraftQuery = checked("k21_top_orders_per_priority",
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""") { (spark, dir) =>
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** K22 — per-type daily tumbling aggregation over the events stream
    * table (batch-checkable analog of the streaming windowed agg). */
  val eventsDaily: GraftQuery = checked("k22_events_daily",
    """SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY event_type, day ORDER BY event_type, day""") { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dround(sum("value"), 2).as("total_value"))
      .orderBy("event_type", "day")
  }

  /** K23 — JSON property extraction + per-user aggregation. Uses
    * regexp_extract (identical semantics in both engines; on Spark it
    * stays inside whole-stage codegen, unlike a UDF). */
  val purchasePropsByUser: GraftQuery = checked("k23_purchase_props_by_user",
    """SELECT user_id,
           CAST(SUM(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id ORDER BY user_id LIMIT 50""") { (spark, dir) =>
    Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        sum(regexp_extract(col("props"), "\"k\": (-?\\d+)", 1).cast("int")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
      .limit(50)
  }

  val all: Seq[GraftQuery] = Seq(
    tableCounts, pricingSummary, revenueByNation, topOrdersPerPriority,
    eventsDaily, purchasePropsByUser)
}
