package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.dround
import graft.sources.Tables

/** Product/supplier analytics — the star-schema arms (`part`,
  * `supplier`) that had NO operator coverage until round 12 (every
  * other table fed the K/ns surface; a user porting their TPC-H-style
  * reporting would have hit a wall). Three classic shapes, each with
  * the house exact-integer money discipline (quantize per TERM —
  * cents / discount basis points — then BIGINT sums, so both engines
  * add exact integers in any order; doubles appear only in the final
  * shared-parenthesization ratio):
  *
  *  - [[partsProfit]] (TPC-H Q9 shape): net-of-discount revenue and
  *    catalog value per (supplier nation, part type).
  *  - [[partsSmallQty]] (Q17 shape): revenue trapped in small-quantity
  *    orders per brand — the classic "should we batch these?" report.
  *  - [[supplierRank]] (Q2 flavor): top suppliers per nation by
  *    account balance.
  *
  * Scale shapes: Q9 joins broadcast the nation dim and let AQE size
  * the part/supplier sides (corpus-scaled at 100 TB — forced
  * broadcasts would be a fixture-size assumption); Q17's per-part
  * aggregate is parts-sized and equi-joins back on the part key (no
  * window over the fact stream); Q2 is a dimension-only window with
  * WindowGroupLimit. */
object AnalyticsParts {

  private val centsL = expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")
  private val discBp = expr("CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)")
  private val qtyL = expr("CAST(l_quantity AS BIGINT)") // integral-valued by schema

  /** Overflow bound: cents ≤ ~1.05e7, ×(10000−disc) ≤ 1.05e11/row;
    * BIGINT holds ~9e18, so the per-group sum is safe to ~8e7 rows per
    * group — beyond that (deep-100 TB per-group cardinality) swap the
    * sum to DECIMAL(38,0), the [[EventStats]] burstiness discipline. */
  val partsProfit: GraftQuery = GraftQuery.checked("ns_parts_profit",
    """SELECT n.n_name AS nation, p.p_type,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5) AS BIGINT))) AS BIGINT)
                 / 1000000.0, 2) AS net_revenue,
           ROUND(CAST(SUM(CAST(l.l_quantity AS BIGINT)
                          * CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS catalog_value
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    ORDER BY nation, p_type""") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(spark, dir), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"), col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        dround(sum(centsL * (lit(10000L) - discBp)).cast("double") / 1000000.0, 2)
          .as("net_revenue"),
        dround(sum(qtyL * expr("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)"))
          .cast("double") / 100.0, 2).as("catalog_value"))
      .orderBy("nation", "p_type")
  }

  /** Strictly-below-half-average via pure integers: qty < sum/(2n) ⇔
    * 2·qty·n < sum — no float average, no interpolation to diverge
    * on. The p_size ≤ 25 cut is a pushdown-able dimension predicate
    * (plan-pinned). */
  val partsSmallQty: GraftQuery = GraftQuery.checked("ns_parts_small_qty",
    """WITH pq AS (
      SELECT l_partkey, COUNT(*) AS n_l,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_partkey),
    small AS (
      SELECT p.p_brand, CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem l
      JOIN pq ON pq.l_partkey = l.l_partkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size <= 25
        AND 2 * CAST(l.l_quantity AS BIGINT) * pq.n_l < pq.sum_qty)
    SELECT p_brand, COUNT(*) AS n_small,
           ROUND(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS small_revenue
    FROM small GROUP BY p_brand
    ORDER BY p_brand""") { (spark, dir) => smallQtyFrame(spark, dir) }

  /** Broadcast the per-part aggregate and the size-filtered part dim
    * only while their measured counts stay under the cap (r15 left this
    * row on AQE-off SortMergeJoins because a static broadcast hint is a
    * fixture-size assumption — both smaller sides are PARTS-sized and
    * grow with SF; the guard-count conditional, the
    * `Dedup.simhashViolations` idiom, is scale-correct: counts are
    * session memo scalars derived from the data, and past the cap both
    * joins shuffle exactly as before). Cap sized to the broadcast
    * contract: ~24 B/row ⇒ 2M rows ≈ 50 MB per relation, far inside
    * the 8 GB broadcast cap yet big enough that any corpus that
    * exceeds it genuinely belongs on a shuffle. */
  private[graft] val PartsBroadcastCap = 2000000L

  private[graft] def smallQtyFrame(spark: org.apache.spark.sql.SparkSession, dir: String,
      broadcastCap: Long = PartsBroadcastCap): org.apache.spark.sql.DataFrame = {
    val pq = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_l"), sum(qtyL).as("sum_qty"))
    val smallParts = Tables.part(spark, dir).where(col("p_size") <= 25)
    val nPq = OpMemo.cachedLong(spark, dir, "parts:n-lineitem-partkeys")(pq.count())
    val nSmall = OpMemo.cachedLong(spark, dir, "parts:n-small-parts")(smallParts.count())
    val pqSide = if (nPq < broadcastCap) broadcast(pq) else pq
    val partSide = if (nSmall < broadcastCap) broadcast(smallParts) else smallParts
    Tables.lineitem(spark, dir)
      .join(pqSide, "l_partkey")
      .join(partSide, col("p_partkey") === col("l_partkey"))
      .where(lit(2L) * qtyL * col("n_l") < col("sum_qty"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        dround(sum(centsL).cast("double") / 100.0, 2).as("small_revenue"))
      .orderBy("p_brand")
  }

  /** Top-2 suppliers per nation by (acctbal DESC, name) — dimension
    * window, WindowGroupLimit plan. */
  val supplierRank: GraftQuery = GraftQuery.checked("ns_supplier_rank",
    """SELECT nation, s_name, acctbal, rk FROM (
      SELECT n.n_name AS nation, s.s_name,
             ROUND(s.s_acctbal, 2) AS acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal DESC, s.s_name) AS rk
      FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey)
    WHERE rk <= 2
    ORDER BY nation, rk""") { (spark, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("nation").orderBy(col("s_acctbal").desc, col("s_name"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("n_nationkey") === col("s_nationkey"))
      .select(col("n_name").as("nation"), col("s_name"), col("s_acctbal"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
      .select(col("nation"), col("s_name"),
        dround(col("s_acctbal"), 2).as("acctbal"),
        col("rk").cast("long").as("rk")) // DuckDB ROW_NUMBER is BIGINT
      .orderBy("nation", "rk")
  }

  /** Q18 shape — the top-100 LARGE orders (total quantity > 150) with
    * the purchasing customer: output BOUNDED at any SF (ORDER BY +
    * LIMIT plans TakeOrderedAndProject — no full sort, no unbounded
    * result at 100 TB). Integer quantities end to end; l_linenumber's
    * max doubles as the order's line count under the fixture's
    * 1-based-ordinal contract. */
  val ordersLarge: GraftQuery = GraftQuery.checked("ns_orders_large",
    """SELECT c.c_name, o.o_orderkey,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(MAX(l.l_linenumber) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100""") { (spark, dir) =>
    // Pre-aggregate the fact table by its OWN key and filter BEFORE the
    // joins (o_orderkey is the orders PK, so grouping by l_orderkey
    // first is semantics-preserving): the >150 cut drops ~all orders,
    // so the joins see a sliver, not the full fact stream — at 100 TB
    // this is one fact shuffle instead of two fact-wide join exchanges,
    // and AQE can broadcast the filtered aggregate against both dims
    // (r12 perf pass; the first cut joined lineitem through
    // orders×customer and aggregated last).
    val largeOrders = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(qtyL).as("total_qty"),
        max(col("l_linenumber")).cast("long").as("n_lines"))
      .where(col("total_qty") > 150)
    largeOrders
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("total_qty"), col("n_lines"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q16 flavor — named-part revenue: a `p_name LIKE '%red%'` cut that
    * PUSHES to the part scan (StringContains, plan-pinned), then
    * supplier breadth + exact-cents revenue per brand. */
  val partsNamed: GraftQuery = GraftQuery.checked("ns_parts_named",
    """SELECT p.p_brand,
           COUNT(DISTINCT p.p_partkey) AS n_parts,
           COUNT(DISTINCT l.l_suppkey) AS n_supp,
           ROUND(CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1
    ORDER BY p_brand""") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_name").contains("red")),
        col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(countDistinct("p_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supp"),
        dround(sum(centsL).cast("double") / 100.0, 2).as("revenue"))
      .orderBy("p_brand")
  }

  val all: Seq[GraftQuery] =
    Seq(partsProfit, partsSmallQty, supplierRank, ordersLarge, partsNamed)
}
