package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** CDC MERGE — apply a change batch onto a keyed snapshot with
  * upsert/delete semantics (the `MERGE INTO` every incremental
  * warehouse load runs; reference analog: the state-overwrite point
  * ops D15–D17 are single-key merges — this is the set-oriented form
  * a 100 TB dimension maintains itself with).
  *
  * Semantics (SCD type-1, latest-wins): the per-user profile row is
  * the user's most recent event before the cutoff (the SNAPSHOT); the
  * events at/after the cutoff are the CHANGE BATCH. Within the batch
  * only the latest change per key applies (ties broken by event_id —
  * the repo-wide composite order, identical on both engines). A
  * latest change of type 'error' is a TOMBSTONE: the key is deleted
  * (a tombstone for an absent key is a no-op, not an insert). Every
  * surviving row carries its provenance: `keep` (snapshot untouched),
  * `update` (key in both, change wins), `insert` (key new in batch).
  *
  * Scale shape: latest-per-key on each side is ONE shuffle of that
  * side on user_id (`row_number` over (ts, event_id) DESC — a whale
  * user costs O(n log n) in its partition, never a pair product), and
  * the merge is a full-outer equi-join on the SAME key, so at 100 TB
  * the stored dimension is bucketed by user_id on disk and never
  * re-shuffles ([[ScaleOps.writeBucketed]]; ScaleOpsSpec pins the
  * no-Exchange bucketed join) — the batch-sized side is the only
  * thing that moves. Cost per incremental load ∝ batch + touched
  * buckets, NOT snapshot size: the property that makes hourly loads
  * of a PB-scale dimension feasible. Determinism: cents are
  * FLOOR(value·100 + 0.5) BIGINTs (the [[EventStats]] convention),
  * every tie has an event_id tiebreak, and the action column is pure
  * presence algebra on the join sides.
  */
object EventCdc {

  private val CutoffLit = "2024-01-16 00:00:00"

  /** Latest event per user from `ev`, deterministic (ts, event_id) DESC. */
  private def latestPerKey(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** The merged dimension after applying the change batch. */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame =
    cdcMergeAt(spark, dir, CutoffLit)

  /** Parameterized cutoff — the SQL surface's `graft_cdc_merge(dir,
    * cutoff)` table function ([[graft.plans.GraftSql]]). The cutoff
    * string is VALIDATED here, at the boundary (r12 review): under a
    * non-ANSI session a malformed timestamp cast to NULL, both
    * `ts < NULL` and `ts >= NULL` dropped every row, and the merge
    * returned an apparently-valid EMPTY dimension; under the ANSI
    * default the same typo failed deep in execution instead of at
    * argument parsing. */
  def cdcMergeAt(spark: SparkSession, dir: String, cutoffTs: String): DataFrame = {
    // Validate with Spark's OWN string→timestamp cast (non-ANSI eval:
    // null ⇔ unparseable) so the accepted surface is exactly what the
    // downstream `lit(cutoff).cast("timestamp")` understands — the
    // first cut whitelisted three JDK parsers and rejected
    // Spark-legal forms like '2024-06-01T10:00:00' and
    // '2024-06-01 10:00' (r12 ADVICE).
    val parsed = org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(cutoffTs),
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone),
      org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY).eval()
    require(parsed != null,
      s"graft_cdc_merge: cutoff '$cutoffTs' is not a timestamp " +
        "(any form Spark's CAST(… AS TIMESTAMP) accepts, e.g. " +
        "'yyyy-MM-dd[ HH:mm[:ss[.f…]]]' or ISO-8601)")
    cdcMergeCore(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")),
      cutoffTs)
  }

  /** Core on any (user_id, event_id, event_type, ts, cents) frame —
    * the spec drives tombstone/no-op/insert/update corners directly. */
  def cdcMergeCore(ev: DataFrame, cutoffTs: String): DataFrame = {
    val cutoff = lit(cutoffTs).cast("timestamp")
    val snap = latestPerKey(ev.where(col("ts") < cutoff))
      .select(col("user_id"), col("event_type").as("s_state"),
        col("cents").as("s_cents"), col("ts").as("s_ts"))
    val chg = latestPerKey(ev.where(col("ts") >= cutoff))
      .select(col("user_id"), col("event_type").as("c_state"),
        col("cents").as("c_cents"), col("ts").as("c_ts"),
        (col("event_type") === "error").as("tomb"))
    snap.join(chg, Seq("user_id"), "full_outer")
      .where(coalesce(!col("tomb"), lit(true))) // tombstone deletes; snapshot-only rows keep
      .select(col("user_id"),
        coalesce(col("c_state"), col("s_state")).as("state"),
        coalesce(col("c_cents"), col("s_cents")).as("cents"),
        coalesce(col("c_ts"), col("s_ts")).as("ts"),
        when(col("s_state").isNull, "insert")
          .when(col("c_state").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("user_id")
  }

  val merge: GraftQuery =
    GraftQuery.checked("ns_events_cdc_merge",
      s"""WITH ev AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    snap AS (
      SELECT user_id, event_type AS s_state, cents AS s_cents, ts AS s_ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev WHERE ts < TIMESTAMP '$CutoffLit')
      WHERE rn = 1),
    chg AS (
      SELECT user_id, event_type AS c_state, cents AS c_cents, ts AS c_ts,
             event_type = 'error' AS tomb
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev WHERE ts >= TIMESTAMP '$CutoffLit')
      WHERE rn = 1)
    SELECT COALESCE(s.user_id, c.user_id) AS user_id,
           COALESCE(c.c_state, s.s_state) AS state,
           COALESCE(c.c_cents, s.s_cents) AS cents,
           COALESCE(c.c_ts, s.s_ts) AS ts,
           CASE WHEN s.s_state IS NULL THEN 'insert'
                WHEN c.c_state IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM snap s FULL OUTER JOIN chg c ON s.user_id = c.user_id
    WHERE COALESCE(NOT c.tomb, TRUE)
    ORDER BY user_id""")((s, d) => cdcMerge(s, d))

  val all: Seq[GraftQuery] = Seq(merge)
}
