package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weak-scaling probe for the round-4 operators:
  *
  *  - exact vs Bloom-prefiltered n-gram decontamination, on corpora
  *    where the TRAINING side grows 10× and the probe (eval-suite) side
  *    stays fixed — the regime the Bloom path exists for (the exact
  *    plan's corpus-gram DISTINCT grows with the corpus; the Bloom
  *    plan's distinct only with the probe-overlap);
  *  - k-means training (assignment map stage + quantized-sum update)
  *    on 1×/10× synthetic embedding tables;
  *  - Misra–Gries heavy hitters vs explode+groupBy on a skewed token
  *    stream with a vocabulary far above sketch capacity.
  *
  * Synthetic corpora are content-independent across replicas (every
  * token carries a replica prefix), matching the methodology of the
  * round-2 dedup weak-scaling runs. Results go to BASELINE.md.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR4"`
  */
object ScaleProbeR4 {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
  private def best2(f: => Long): Double = { time(f); math.min(time(f)._2, time(f)._2) }

  def main(args: Array[String]): Unit = {
    // the 10x sections hold ~10M cached docs: below ~16 GB the heavy-
    // hitters stage OOMs mid-probe (run/fork heap comes from
    // SPARK_DRIVER_MEM, see build.sbt) — fail fast with the fix instead
    val heapG = Runtime.getRuntime.maxMemory() / (1L << 30)
    require(heapG >= 15,
      s"probe needs a >=16g heap (have ${heapG}g) — run with SPARK_DRIVER_MEM=24g")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scale-probe-r4")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- decontamination: corpus grows 10x, probe fixed ------------------
    // synthetic (doc_id, sh) frames: each doc = 60 hashed "grams" drawn
    // from a per-replica keyspace (content-independent replicas); probe
    // docs (id % 10 == 0) draw from replica 0's keyspace only, so probe
    // overlap stays fixed while corpus gram volume grows linearly.
    def gramDocs(nDocs: Long, nReplicas: Int): DataFrame =
      spark.range(nDocs).select(col("id").as("doc_id"),
        transform(sequence(lit(0), lit(59)),
          i => when(col("id") % 10 === 0,
            // probe side: replica-0 keyspace (fixed overlap target)
            xxhash64(col("id") % 5000 * 60 + i))
            .otherwise(
              xxhash64(pmod(col("id"), lit(nReplicas)) * 1000000000L + col("id") * 60 + i)))
          .as("sh"))
        .repartition(32).cache()

    for ((n, reps, tag) <- Seq((200000L, 1, "decontam 1x (200k)"),
                               (2000000L, 10, "decontam 10x (2M)"))) {
      val docs = gramDocs(n, reps); docs.count()
      val e = best2(graft.operators.Dedup.ngramDecontamCore(docs).count())
      val b = best2(graft.operators.Dedup.ngramDecontamBloomCore(docs).count())
      println(f"[probe] $tag%-20s exact=$e%6.2fs bloom=$b%6.2fs")
      docs.unpersist()
    }

    // --- k-means: 1x/10x synthetic embeddings ----------------------------
    // deterministic pseudo-random unit-scale floats from the row id; the
    // training loop (2 assignment passes + 2 quantized-sum updates) is
    // driven through the private core by swapping the table source via a
    // temp view is not possible — so replicate the refine math inline.
    def embTable(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id") * 64 + i), lit(1000000L)).cast("double") / 1e6 - 0.5)
            .cast("float")).as("embedding"))
        .repartition(32).cache()

    def trainOn(emb: DataFrame, k: Int): Double = {
      import graft.functions.VectorExpressions.vecDotFD
      var cents: Seq[(Int, Seq[Double])] = emb.where(col("vec_id") < k)
        .select(col("vec_id").cast("int"), col("embedding"))
        .as[(Int, Array[Float])].collect()
        .map { case (cid, v) => cid -> v.toSeq.map(_.toDouble) }.sortBy(_._1).toSeq
      val (_, secs) = time {
        for (_ <- 0 until 2) {
          val assign = greatest(cents.map { case (cid, c) =>
            struct((vecDotFD(col("embedding"), array(c.map(lit): _*)) -
              lit(c.map(x => x * x).sum / 2)).as("score"), lit(cid).as("cid"))
          }: _*).getField("cid")
          val sums = emb.withColumn("cluster", assign)
            .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
            .groupBy("cluster", "pos")
            .agg(sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("sq"),
              count(lit(1)).as("n"))
            .collect()
          cents = sums.groupBy(_.getInt(0)).view.mapValues { rows =>
            rows.sortBy(_.getInt(1)).map(r => r.getLong(2) / (1e6 * r.getLong(3))).toSeq
          }.toSeq.sortBy(_._1)
        }
      }
      secs
    }

    for ((n, tag) <- Seq((1000000L, "kmeans 1x (1M)"), (10000000L, "kmeans 10x (10M)"))) {
      val emb = embTable(n); emb.count()
      val secs = trainOn(emb, 8)
      println(f"[probe] $tag%-20s train(2 iters)=$secs%6.2fs")
      emb.unpersist()
    }

    // --- heavy hitters: skewed stream, vocab >> capacity -----------------
    // token id = vocab * u^3 (u uniform from a hash) — Zipf-ish skew;
    // vocabulary ~1M distinct >> capacity 4096.
    def tokenDocs(nDocs: Long): DataFrame =
      spark.range(nDocs).select(
        transform(sequence(lit(0), lit(29)), i => {
          val u = pmod(xxhash64(col("id") * 30 + i), lit(1000000L)).cast("double") / 1e6
          concat(lit("t"), floor(u * u * u * 1000000).cast("long").cast("string"))
        }).as("toks"))
        .repartition(32).cache()

    for ((n, tag) <- Seq((1000000L, "hh 1x (1M docs)"), (10000000L, "hh 10x (10M docs)"))) {
      val docs = tokenDocs(n); docs.count()
      val naive = best2(docs.select(explode(col("toks")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t")).limit(20).count())
      val agg = new graft.functions.MisraGriesAggregator(4096).toColumn
      val mg = best2 {
        val sk = docs.as[Seq[String]].groupByKey(_ => 0).agg(agg.name("sk"))
          .collect().head._2
        sk.counts.size.toLong
      }
      println(f"[probe] $tag%-20s naive=$naive%6.2fs mg-sketch=$mg%6.2fs")
      docs.unpersist()
    }

    // --- as-of join: one shuffle + one sort, 1x/10x ----------------------
    // synthetic tagged stream: 100k users, ~80% views / 20% purchases,
    // timestamps spread over a year
    def taggedEvents(n: Long): org.apache.spark.sql.DataFrame =
      spark.range(n).select(
        pmod(xxhash64(col("id")), lit(100000L)).as("user_id"),
        timestamp_micros(lit(1704067200000000L) +
          pmod(xxhash64(col("id") + 7), lit(31536000000000L))).as("ts"),
        when(pmod(xxhash64(col("id") + 13), lit(5)) === 0, 1).otherwise(0).as("side"),
        col("id").as("id"))
        .repartition(32).cache()

    for ((n, tag) <- Seq((2000000L, "asof 1x (2M)"), (20000000L, "asof 10x (20M)"))) {
      val ev = taggedEvents(n); ev.count()
      // filter on the window's output so column pruning cannot drop the
      // window itself (a bare count() optimizes the whole as-of away)
      val secs = best2(graft.operators.Analytics2.asofCore(ev)
        .where(col("view_id").isNotNull).count())
      println(f"[probe] $tag%-20s asof=$secs%6.2fs")
      ev.unpersist()
    }

    spark.stop()
  }
}
