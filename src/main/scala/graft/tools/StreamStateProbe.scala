package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.orchestration.StateMachine.Meta
import graft.streaming.{IncubationStream, StreamingCdc}
import graft.streaming.IncubationStream.KeyedDepSat

/** Service-level streaming state bounds under the RocksDB backend
  * (r6 verdict #7): the streaming twins are replay-spec'd at fixture
  * scale; this probe drives [[StreamingCdc]] and [[IncubationStream]]
  * over 1× vs 10× synthetic logs and reads the STATE-STORE metrics
  * from query progress, proving the documented bounds hold where they
  * matter at 100 TB — state ∝ keys (users / open incubations), NEVER
  * ∝ events:
  *
  *  1. CDC dimension: 10× the event log over a FIXED user set →
  *     `numRowsTotal` stays exactly |users| (O(1) per key), wall grows
  *     ∝ events (the per-batch fold), RocksDB memory stays user-bound.
  *  2. Incubation: K keys, half released (state removed), half left
  *     partial; dep events replicated 10× (duplicate satisfactions) →
  *     state stays exactly K/2 open keys.
  *
  * Results → BASELINE.md. Run:
  * `sbt "runMain graft.tools.StreamStateProbe"`
  */
object StreamStateProbe {

  final case class Progress(stateRows: Long, stateBytes: Long, outRows: Long, sec: Double)

  private def runToEnd(df: DataFrame, name: String, ckpt: String): Progress = {
    val t0 = System.nanoTime()
    val q = df.writeStream.format("noop")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    require(q.awaitTermination(600000), s"$name did not finish in 600s")
    val sec = (System.nanoTime() - t0) / 1e9
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val out = q.recentProgress.map(_.stateOperators.map(_.numRowsUpdated).sum).sum
    q.stop()
    Progress(ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum, out, sec)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    // --- 1. CDC dimension: events x10, users fixed --------------------
    val users = 20000L
    def cdcEvents(n: Long): DataFrame =
      spark.range(n).select(
        (col("id") % users).as("user_id"),
        col("id").as("event_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase"), lit("signup"),
          lit("error")), (col("id") % 5 + 1).cast("int")).as("event_type"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts"),
        (col("id") % 1000L).as("cents"))
    def cdcRun(n: Long, tag: String): Progress = {
      val src = tmp(s"cdc-$tag-src")
      cdcEvents(n).coalesce(4).write.mode("overwrite").parquet(src)
      val stream = spark.readStream
        .schema("user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP, cents BIGINT")
        .parquet(src)
        .as(org.apache.spark.sql.Encoders.product[StreamingCdc.CdcEvent])
      runToEnd(StreamingCdc.dimensionStream(stream).toDF(),
        s"cdc-$tag", tmp(s"cdc-$tag-ckpt"))
    }
    cdcRun(50000L, "warm") // first streaming query pays session init
    val c1 = cdcRun(200000L, "1x")
    val c10 = cdcRun(2000000L, "10x")
    println(f"[state] cdc 1x : events=200000 stateRows=${c1.stateRows} " +
      f"stateMB=${c1.stateBytes / 1e6}%.1f wall=${c1.sec}%.1f s")
    println(f"[state] cdc 10x: events=2000000 stateRows=${c10.stateRows} " +
      f"stateMB=${c10.stateBytes / 1e6}%.1f wall=${c10.sec}%.1f s " +
      f"(rows ${c10.stateRows.toDouble / c1.stateRows}%.2fx, wall ${c10.sec / c1.sec}%.2fx)")
    require(c1.stateRows == users && c10.stateRows == users,
      s"CDC state must be exactly |users|=$users: got ${c1.stateRows} / ${c10.stateRows}")

    // --- 2. Incubation: open keys FIXED, dep traffic x10 --------------
    // the bound that matters: state ∝ OPEN incubations, never ∝ total
    // dep satisfactions. Open set held at 5000 partial keys; the 10x
    // run pushes 10x the dep events through 10x as many fully-released
    // keys (satisfied pairs leave the store immediately).
    val open = 5000
    val now = new Timestamp(1704067200000L)
    def incubRun(released: Int, tag: String): Progress = {
      val total = open + released
      val metas: Map[String, Meta] = (0 until total).map(i =>
        s"p-$i" -> Meta(Some("all"), Seq("a", "b"), 0, concurrency = false)).toMap
      // keys [0, open): dep 'a' only (stay open); [open, total): both
      val sats: Seq[KeyedDepSat] = (0 until total).flatMap { i =>
        val base = Seq(KeyedDepSat(s"p-$i", "a", s"ex-a-$i", i.toLong * 2, now))
        if (i >= open) base :+ KeyedDepSat(s"p-$i", "b", s"ex-b-$i", i.toLong * 2 + 1, now)
        else base
      }
      val src = tmp(s"inc-$tag-src")
      spark.createDataset(sats).coalesce(4).write.mode("overwrite").parquet(src)
      val stream = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[KeyedDepSat].schema)
        .parquet(src).as[KeyedDepSat]
      runToEnd(IncubationStream.submissions(stream, metas, Some(now), cullIntervalMs = 0L).toDF(),
        s"inc-$tag", tmp(s"inc-$tag-ckpt"))
    }
    val i1 = incubRun(5000, "1x")    // 15k dep events
    val i10 = incubRun(72500, "10x") // 150k dep events, same 5000 open
    println(f"[state] incubation 1x : deps=15000 stateRows=${i1.stateRows} " +
      f"stateMB=${i1.stateBytes / 1e6}%.1f wall=${i1.sec}%.1f s")
    println(f"[state] incubation 10x: deps=150000 stateRows=${i10.stateRows} " +
      f"stateMB=${i10.stateBytes / 1e6}%.1f wall=${i10.sec}%.1f s " +
      f"(rows ${i10.stateRows.toDouble / i1.stateRows}%.2fx, wall ${i10.sec / i1.sec}%.2fx)")
    require(i1.stateRows == open && i10.stateRows == open,
      s"incubation state must be exactly the $open open keys: got ${i1.stateRows} / ${i10.stateRows}")

    println("[state] PASS: state rows-and-bytes key-bound under RocksDB; events x10 left state flat")
    spark.stop()
  }
}
