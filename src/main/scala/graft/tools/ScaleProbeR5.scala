package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weak-scaling + SKEW probes for the round-5 operators:
  *
  *  - WHALE-KEY skew over the merge-scan family (as-of, attribution,
  *    sessions): one user holds 10% of all rows — the regime where the
  *    old attribution range join went P×T quadratic (round-4 verdict
  *    #2) and where any per-key operator shows its straggler. The
  *    1×/10× pair quantifies the cost of the whale: a per-user window
  *    serializes that key into one task, so the bound is O(w log w) for
  *    whale size w — a sort, not a pair product. (AQE skew-split
  *    applies to shuffle JOINS, not window partitions: there is no
  *    free lunch for a single logical key — the fix the code takes is
  *    keeping per-key work linear-log, which this section measures.)
  *  - FUNNEL contamination stage, naive vs Bloom (round-4 verdict #4):
  *    training corpus grows 10×, probe (eval suite) fixed. The naive
  *    shape shuffles every corpus gram into the join; the Bloom path
  *    kills non-candidate grams scan-side and broadcasts the exact
  *    gram set.
  *  - SEMDEDUP pair scan (round-4 verdict #5): (a) corpus AND K scale
  *    10× together → E[|cluster|] fixed, pair work grows linearly —
  *    the "raise K with the corpus" contract; (b) a whale cluster
  *    holding half the corpus, unsharded vs salt-split into bounded
  *    shard-pair tasks — same pair count, no single-reducer straggler.
  *
  *  - AQE skew-join (`aqejoin`): the whale key through a shuffle JOIN,
  *    where OptimizeSkewedJoin DOES split — measured off vs on.
  *  - INTERVAL-overlap join (`ivjoin`): naive theta (nested-loop) vs
  *    the 1-hour-bin equi-join of `ns_events_interval_join`, then the
  *    bin plan weak-scaled 10× (both sides + time range together,
  *    reducers scaled, broadcast off) — the shape that survives when
  *    neither interval set fits an executor.
  *  - Duplicated-SPAN dedup (`spans`): corpus 10× with reducers fixed
  *    vs scaled (the hash-agg working-set effect), plus a whale GRAM
  *    (50% of docs share a boilerplate block) proving the pair-free
  *    claim — occurrence-linear cost, no C(occ,2) term.
  *
  * Synthetic inputs are content-independent across replicas (hash-
  * derived), matching the round-2/round-4 probe methodology. Results
  * go to BASELINE.md.
  *
  * Run: `SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.ScaleProbeR5"`
  */
object ScaleProbeR5 {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
  private def best2(f: => Long): Double = { time(f); math.min(time(f)._2, time(f)._2) }

  def main(args: Array[String]): Unit = {
    // optional args: section names to run (skew, contam, semdedup,
    // aqejoin, dag, ivjoin, spans, gram, pmi, pagerank, triangles,
    // kcore, rank); no args = all
    val sections: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    val heapG = Runtime.getRuntime.maxMemory() / (1L << 30)
    require(heapG >= 15,
      s"probe needs a >=16g heap (have ${heapG}g) — run with SPARK_DRIVER_MEM=24g")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scale-probe-r5")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- whale-key skew: user 0 holds 10% of all rows --------------------
    def skewedEvents(n: Long): DataFrame =
      spark.range(n).select(
        when(pmod(xxhash64(col("id") + 3), lit(10)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("user_id"),
        timestamp_micros(lit(1704067200000000L) +
          pmod(xxhash64(col("id") + 7), lit(31536000000000L))).as("ts"),
        when(pmod(xxhash64(col("id") + 13), lit(5)) === 0, 1).otherwise(0).as("side"),
        col("id").as("id"),
        (pmod(xxhash64(col("id") + 17), lit(3)) === 0).as("is_click"))
        .repartition(32).cache()

    if (sections("skew")) for ((n, tag) <- Seq((2000000L, "skew 1x (2M)"), (20000000L, "skew 10x (20M)"))) {
      val ev = skewedEvents(n); ev.count()
      val asof = best2(graft.operators.Analytics2.asofCore(ev)
        .where(col("view_id").isNotNull).count())
      val attr = best2(graft.operators.EventOps.attributionCore(ev)
        .where(col("n_touches") > 0).count())
      val sess = best2(ev
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events")).count())
      // the ordered funnel makes the same no-pair-product claim as
      // attribution (running-min frames, not per-stage joins) — the
      // whale user must cost a sort, not a cross product
      val fun = best2(graft.operators.EventOps.funnelStepsCore(
        ev.select(col("user_id"),
          when(col("side") === 1, "purchase")
            .when(col("is_click"), "click").otherwise("view").as("event_type"),
          unix_micros(col("ts")).as("ts_us"))).count())
      println(f"[probe] $tag%-22s asof=$asof%6.2fs attribution=$attr%6.2fs sessions=$sess%6.2fs funnel=$fun%6.2fs")
      ev.unpersist()
    }

    // --- funnel contamination: corpus grows 10x, probe fixed -------------
    // same generator as ScaleProbeR4's decontam section: 60 hashed grams
    // per doc; probe docs (id % 10 == 0) draw from replica-0's keyspace
    def gramDocs(nDocs: Long, nReplicas: Int): DataFrame =
      spark.range(nDocs).select(col("id").as("doc_id"),
        transform(sequence(lit(0), lit(59)),
          i => when(col("id") % 10 === 0,
            xxhash64(col("id") % 5000 * 60 + i))
            .otherwise(
              xxhash64(pmod(col("id"), lit(nReplicas)) * 1000000000L + col("id") * 60 + i)))
          .as("sh"))
        .repartition(32).cache()

    def naiveContaminated(sh: DataFrame): DataFrame = {
      val probeGrams = sh.where(col("doc_id") % 10 === 0)
        .select(explode(col("sh")).as("g")).distinct()
      sh.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .join(probeGrams, "g").select("doc_id").distinct()
    }

    if (sections("contam")) for ((n, reps, tag) <- Seq((200000L, 1, "contam 1x (200k)"),
                               (2000000L, 10, "contam 10x (2M)"))) {
      val docs = gramDocs(n, reps); docs.count()
      val naive = best2(naiveContaminated(docs).count())
      val bloom = best2(graft.operators.Curation.contaminatedIdsCore(spark, docs).count())
      println(f"[probe] $tag%-22s naive=$naive%6.2fs bloom=$bloom%6.2fs")
      docs.unpersist()
    }

    // --- semdedup: K scales with the corpus; whale cluster salt-split ----
    def assignedEmb(n: Long, k: Int, whaleFrac: Int): DataFrame =
      spark.range(n).select(
        when(pmod(xxhash64(col("id") + 3), lit(whaleFrac)) =!= 0,
          pmod(xxhash64(col("id") + 1), lit(k.toLong)).cast("int") + 1)
          .otherwise(lit(0)).as("cluster_id"),
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(7)),
          i => (pmod(xxhash64(col("id") * 8 + i), lit(1000000L)).cast("double") / 1e6 - 0.5)
            .cast("float")).as("embedding"))
        .repartition(32).cache()

    // (a) corpus 10x with K 10x: E[|cluster|] ~ 500 fixed -> linear pairs
    if (sections("semdedup")) for ((n, k, tag) <- Seq((200000L, 400, "semdedup 1x (200k,K=400)"),
                            (2000000L, 4000, "semdedup 10x (2M,K=4k)"))) {
      val emb = assignedEmb(n, k, whaleFrac = 1000000000); emb.count()
      val secs = best2(graft.operators.VectorsKmeans
        .semDedupCore(spark, emb, tau = 0.95, maxClusterRows = Long.MaxValue)
        .count())
      println(f"[probe] $tag%-26s pairs-scan=$secs%6.2fs")
      emb.unpersist()
    }

    // (b) whale cluster: cluster 0 holds ~50% of 40k vectors
    if (sections("semdedup")) {
      val emb = assignedEmb(40000L, 64, whaleFrac = 2); emb.count()
      val mono = best2(graft.operators.VectorsKmeans
        .semDedupCore(spark, emb, tau = 0.95, maxClusterRows = Long.MaxValue).count())
      val shard = best2(graft.operators.VectorsKmeans
        .semDedupCore(spark, emb, tau = 0.95, maxClusterRows = 4096L).count())
      println(f"[probe] whale cluster (20k of 40k) unsharded=$mono%6.2fs sharded(cap 4k)=$shard%6.2fs")
      emb.unpersist()
    }

    // --- AQE skew-join: the whale key through a shuffle JOIN -------------
    // Window partitions cannot be split (see the skew section), but
    // shuffle JOINS can: AQE's OptimizeSkewedJoin splits an oversized
    // partition into chunks and replicates the matching build-side
    // partition. Demonstrated on the enrichment join every event
    // pipeline runs (events × per-user dim), whale user = 10% of rows;
    // broadcast disabled so the join actually shuffles (at 100 TB the
    // dim side may be too big to broadcast), thresholds lowered to
    // match probe scale (defaults target 256 MB partitions).
    if (sections("aqejoin")) {
      // HALF of all rows on one user — the regime where the whale's
      // single sort task IS the join's wall-clock; a payload column is
      // aggregated on the far side so pruning can't slim the shuffle
      val ev = spark.range(20000000L).select(
        when(pmod(xxhash64(col("id") + 3), lit(2)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("user_id"),
        xxhash64(col("id") + 7).as("payload"))
        .repartition(32).cache()
      ev.count()
      val dim = spark.range(100000L).select(col("id").as("user_id"),
        concat(lit("segment-"), pmod(col("id"), lit(37))).as("segment"))
        .repartition(32).cache()
      dim.count()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      def run(): Long = ev.join(dim, "user_id")
        .agg(sum(hash(col("payload"), col("segment")))).head().getLong(0)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = best2(run())
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val on = best2(run())
      println(f"[probe] aqe skew join (20M, 10M-row whale) off=$off%6.2fs on=$on%6.2fs")
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.enabled").foreach(spark.conf.unset)
      ev.unpersist(); dim.unpersist()
    }

    // --- DAG transitive closure: component count ×10, output ×10 ---------
    // ns_dag_closure's semi-naive BFS on a synthetic forest of layered
    // DAGs (W=50/layer, L=6 layers, out-degree 2): component count
    // grows 10× so BOTH the edge input and the closure OUTPUT grow
    // exactly 10× while round count (graph depth) stays constant — the
    // honest weak-scaling frame for reachability (a single growing DAG
    // would grow its closure quadratically and measure output size,
    // not the machinery).
    if (sections("dag")) {
      def layeredDag(nComp: Long): DataFrame = {
        val W = 50L; val L = 6L; val D = 2L
        // one row per (component, layer<L-1, idx, child-slot)
        spark.range(nComp * (L - 1) * W * D).select(
          (col("id") / (D * W * (L - 1))).cast("long").as("comp"),
          pmod(col("id") / (D * W), lit(L - 1)).cast("long").as("layer"),
          pmod(col("id") / D, lit(W)).cast("long").as("idx"),
          pmod(xxhash64(col("id")), lit(W)).as("cidx"))
          .select(
            (col("comp") * 1000000L + col("layer") * 1000L + col("idx")).as("src"),
            (col("comp") * 1000000L + (col("layer") + 1) * 1000L + col("cidx")).as("dst"))
          .distinct()
      }
      for ((nc, sp, tag) <- Seq((100L, "32", "dag 1x (100 comp)"),
                                (1000L, "320", "dag 10x (1000 comp)"))) {
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        val e = layeredDag(nc).repartition(32).cache(); e.count()
        val (rows, t) = time(
          graft.operators.MetaQueries.dagClosureCore(e, maxDepth = 10).count())
        println(f"[probe] $tag%-24s closure=$rows%,d pairs in $t%6.2fs")
        e.unpersist()
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }

    // --- interval-overlap join: naive theta vs bin-bucketized ------------
    // The ns_events_interval_join design under load: the naive
    // theta-join (BroadcastNestedLoopJoin, |S|·|W| predicate evals with
    // the build side pinned in every executor) against the 1-hour-bin
    // equi-join, then the bin plan weak-scaled 10× — BOTH sides and the
    // time range grow 10× (so true pair output grows ~10×, the honest
    // weak-scaling frame for a density-preserving corpus), reducers
    // scaled with the data, broadcast disabled so the equi-join
    // actually shuffles (the 100 TB regime where neither side fits).
    if (sections("ivjoin")) {
      val base = 1704067200000000L
      def synthIntervals(nS: Long, nW: Long, rangeUs: Long): (DataFrame, DataFrame) = {
        val sess = spark.range(nS).select(
          col("id").as("user_id"),
          (lit(base) + pmod(xxhash64(col("id")), lit(rangeUs))).as("s_us"))
          .select(col("user_id"), timestamp_micros(col("s_us")).as("session_start"),
            timestamp_micros(col("s_us") + lit(60000000L) +
              pmod(xxhash64(col("user_id") + 5), lit(1740000000L))).as("session_end"),
            lit(1L).as("n_events"))
        val hot = spark.range(nW).select(
          col("id").as("hot_id"),
          (lit(base) + pmod(xxhash64(col("id") + 11), lit(rangeUs))).as("w_us"))
          .select(col("hot_id"), timestamp_micros(col("w_us")).as("w_start"),
            timestamp_micros(col("w_us") + lit(1800000000L)).as("w_end"))
        (sess.repartition(32).cache(), hot.repartition(32).cache())
      }
      // two sizes: |S|·|W| grows 25× while true output grows ~5× — the
      // nested-loop cost tracks the PRODUCT, the bin join tracks the
      // data + output
      for ((nS, nW, tag) <- Seq((200000L, 5000L, "200k×5k"), (1000000L, 25000L, "1M×25k"))) {
        val (s0, h0) = synthIntervals(nS, nW, 31536000000000L)
        s0.count(); h0.count()
        val naive = best2(s0.join(broadcast(h0),
            col("session_start") <= col("w_end") && col("w_start") <= col("session_end"))
          .groupBy("user_id").agg(count(lit(1))).count())
        val bin0 = best2(graft.operators.EventOps.intervalJoinCore(s0, h0)
          .where(col("n_hot_windows") > 0).count())
        println(f"[probe] ivjoin naive-vs-bin ($tag%-8s) theta=$naive%7.2fs bin=$bin0%6.2fs")
        s0.unpersist(); h0.unpersist()
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for ((nS, nW, range, sp, tag) <- Seq(
          (1000000L, 100000L, 31536000000000L, "32", "ivjoin 1x (1M×100k)"),
          (10000000L, 1000000L, 315360000000000L, "320", "ivjoin 10x (10M×1M)"))) {
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        val (s, h) = synthIntervals(nS, nW, range)
        s.count(); h.count()
        val t = best2(graft.operators.EventOps.intervalJoinCore(s, h)
          .where(col("n_hot_windows") > 0).count())
        println(f"[probe] $tag%-26s bin-join=$t%6.2fs")
        s.unpersist(); h.unpersist()
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }

    // --- duplicated-span dedup: corpus 10× and a whale GRAM ---------------
    // The pair-free claim under test: a boilerplate block carried by
    // 50% of all documents costs rows linear in its occurrence count
    // (through the partial-agg count and the join back), never
    // C(occ, 2) pairs — the regime where a pairwise span formulation
    // detonates. Docs are 200 random tokens from a 1e9 vocab (organic
    // gram collisions ~0), with a fixed 32-token boilerplate block
    // spliced into every 20th doc (1×/10×) or every 2nd doc (whale).
    if (sections("spans")) {
      val boiler = array((0 until 32).map(j => lit(s"boiler$j")): _*)
      def spanDocs(n: Long, dupEvery: Int): DataFrame =
        spark.range(n).select(col("id").as("doc_id"),
          transform(sequence(lit(1), lit(200)),
            i => concat(lit("w"), pmod(xxhash64(col("id") * 211 + i), lit(1000000000L)))).as("base"),
          (pmod(xxhash64(col("id") + 5), lit(dupEvery)) === 0).as("dup"))
          .select(col("doc_id"),
            concat_ws(" ",
              when(col("dup"),
                concat(slice(col("base"), 1, 50), boiler, slice(col("base"), 51, 150)))
                .otherwise(col("base"))).as("text"))
          .repartition(32).cache()
      // weak scaling = data AND reducers grow together: at 10× corpus
      // the 193M-unique-gram count needs 10× the reducers to keep each
      // task's hash-agg working set constant (fixed 32 spills: measured
      // 148.5 s vs ~30 s reducer-scaled). A 1000-executor cluster gets
      // this by sizing shuffle.partitions to the data — the repo-wide
      // guidance; local[32] can only emulate it with more, smaller tasks.
      for ((n, dupEvery, parts, tag) <- Seq(
             (100000L, 20, 32, "spans 1x (100k)"),
             (1000000L, 20, 32, "spans 10x (1M, reducers FIXED)"),
             (1000000L, 20, 320, "spans 10x (1M, reducers 10x)"),
             (1000000L, 2, 320, "spans whale-gram (1M, 50% dup)"))) {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val docs = spanDocs(n, dupEvery); docs.count()
        val secs = best2(graft.operators.Dedup.duplicatedSpansCore(docs).count())
        println(f"[probe] $tag%-34s spans-scan=$secs%6.2fs")
        docs.unpersist()
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }

    // --- gram matrix: corpus 10×, output FIXED at d(d+1)/2 cells ----------
    // Two claims under test. (1) zero-join: neither plan ever
    // shuffles on vec_id — wall time tracks the corpus scan,
    // linearly. (2) the aggregator buffer beats the explode plan by
    // an order of magnitude: explode emits d(d+1)/2 struct ROWS per
    // input row (measured 24.7 s / 204.6 s at 1×/10× — linear but
    // 40 µs/row), the flat-buffer fold does the same multiply-adds
    // with zero row churn. d = 64 quantized dims, matching
    // ns_vec_gram.
    if (sections("gram")) {
      def qVecs(n: Long): DataFrame =
        spark.range(n).select(
          transform(sequence(lit(0), lit(63)),
            i => pmod(xxhash64(col("id") * 67 + i), lit(10000L)) - 5000L).as("q"))
          .repartition(32).cache()
      for ((n, tag) <- Seq((500000L, "gram 1x (500k x 64d)"),
                           (5000000L, "gram 10x (5M x 64d)"))) {
        val q = qVecs(n); q.count()
        val secs = best2(
          graft.operators.VectorsPca.gramAggCore(spark, q, 64).count())
        println(f"[probe] $tag%-34s gram-agg=$secs%6.2fs")
        q.unpersist()
      }
    }

    // --- PMI: corpus 10×, pair space FIXED at V(V-1)/2 --------------------
    // The broadcast-vocab claim under test: pair generation is inline
    // codegen (≤ V²/2 emissions per doc) and the pair exchange is
    // V²-bounded, so wall time must track the corpus scan — no doc_id
    // shuffle, no token self-join. 24 distinct tokens per doc from a
    // 50-token vocabulary, V = 20 cut, matching ns_text_pmi's shape.
    if (sections("pmi")) {
      def pmiDocs(n: Long): DataFrame =
        spark.range(n).select(
          array_distinct(transform(sequence(lit(0), lit(23)),
            i => concat(lit("t"), pmod(xxhash64(col("id") * 31 + i), lit(50L)))))
            .as("toks"))
          .repartition(32).cache()
      for ((n, tag) <- Seq((1000000L, "pmi 1x (1M docs)"),
                           (10000000L, "pmi 10x (10M docs)"))) {
        val toks = pmiDocs(n); toks.count()
        val vocab = toks.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("tok")).limit(20)
        val secs = best2(graft.operators.TextPmi.pmiCore(toks, vocab, n).count())
        println(f"[probe] $tag%-34s pmi=$secs%6.2fs")
        toks.unpersist()
      }
    }

    // --- pagerank: edges 10×, same ten power iterations -------------------
    // The per-iteration claim under test: each round is one edge⋈rank
    // equi-join + dst-keyed sum — hash-partitioned work linear in
    // |edges| — so ten rounds at 10× the graph must cost ~10× the
    // join work, never a per-node or per-iteration driver term.
    // Skewed degrees by construction (hash-mod hub bias: node 0
    // receives ~10% of edges), so the dst-keyed sum also exercises
    // the partial-agg path under skew.
    if (sections("pagerank")) {
      def graph(nEdges: Long): DataFrame = {
        val nNodes = nEdges / 10
        spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
          when(pmod(xxhash64(col("id") + 3), lit(10)) === 0, lit(0L))
            .otherwise(pmod(xxhash64(col("id") + 1), lit(nNodes))).as("dst"))
          .where(col("src") =!= col("dst"))
          .repartition(32).cache()
      }
      for ((n, tag) <- Seq((1000000L, "pagerank 1x (1M edges)"),
                           (10000000L, "pagerank 10x (10M edges)"))) {
        val g = graph(n); g.count()
        val secs = best2(graft.operators.MetaQueries.pageRankCore(g).count())
        println(f"[probe] $tag%-34s pagerank=$secs%6.2fs")
        g.unpersist()
      }
    }

    // --- triangles: degree-oriented enumeration under a whale hub -------
    // node 0 receives ~10% of all edges, so under ID-ordered wedge
    // generation the hub alone would center ~(0.1·m)² pairs (5e9 at
    // 1x — infeasible); degree orientation gives the max-degree hub
    // out-degree ~0 (all its edges point INTO it), so wedge volume
    // tracks Σ out-deg² over ordinary nodes and 10× edges should cost
    // ~10-30× wall (pair volume grows with density), never the hub
    // quadratic.
    if (sections("triangles")) {
      def und(nEdges: Long): DataFrame = {
        val nNodes = nEdges / 10
        spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("x"),
          when(pmod(xxhash64(col("id") + 3), lit(10)) === 0, lit(0L))
            .otherwise(pmod(xxhash64(col("id") + 1), lit(nNodes))).as("y"))
          .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
          .where(col("a") =!= col("b")).distinct()
          .repartition(32).cache()
      }
      for ((n, tag) <- Seq((1000000L, "triangles 1x (1M edges)"),
                           (10000000L, "triangles 10x (10M edges)"))) {
        val g = und(n); g.count()
        val secs = best2(
          graft.operators.MetaQueries.triangleCore(g)
            .agg(sum("tri")).collect()(0).getLong(0))
        println(f"[probe] $tag%-34s triangles=$secs%6.2fs")
        g.unpersist()
      }
    }

    // --- kcore: h-index propagation, edges 10× ---------------------------
    // per round: one adjacency⋈values hash join + a per-node window
    // sort bounded by degree — O(m log dmax) hash-partitioned work, no
    // global order. Rounds-to-fixpoint is a graph property (erosion
    // depth), so 10× edges at the same density should cost ~10× per
    // round × a similar round count — never a sequential peel. The
    // whale hub (node 0, ~10% of edges) lands in one window partition;
    // its sort is O(deg log deg), the same bound the skew section
    // establishes for per-key windows.
    if (sections("kcore")) {
      def und(nEdges: Long): DataFrame = {
        val nNodes = nEdges / 10
        spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("x"),
          when(pmod(xxhash64(col("id") + 3), lit(10)) === 0, lit(0L))
            .otherwise(pmod(xxhash64(col("id") + 1), lit(nNodes))).as("y"))
          .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
          .where(col("a") =!= col("b")).distinct()
          .repartition(32).cache()
      }
      for ((n, tag) <- Seq((1000000L, "kcore 1x (1M edges)"),
                           (10000000L, "kcore 10x (10M edges)"))) {
        val g = und(n); g.count()
        val secs = best2(
          graft.operators.MetaQueries.corenessCore(g, maxIters = 64)
            .agg(sum("core")).collect()(0).getLong(0))
        println(f"[probe] $tag%-34s kcore=$secs%6.2fs")
        g.unpersist()
      }
    }

    // --- valueRanks: the two-phase global rank behind gini/RFM ----------
    // rank every row by (value, user_id) without a single-partition
    // window: bin prefix + per-bin row_number. 10× rows must cost ~10×
    // (per-bin width is data-bounded, the bin-offset frame stays
    // value-range-sized); the global-window formulation would funnel
    // all N rows through ONE reducer and is the anti-plan this core
    // exists to avoid.
    if (sections("rank")) {
      def rev(n: Long): DataFrame =
        spark.range(n).select(col("id").as("user_id"),
          pmod(xxhash64(col("id")), lit(1000000L)).as("cents"))
          .repartition(32).cache()
      for ((n, tag) <- Seq((2000000L, "valueRanks 1x (2M users)"),
                           (20000000L, "valueRanks 10x (20M users)"))) {
        val r = rev(n); r.count()
        val secs = best2(
          graft.operators.EventStats.valueRanks(r, "cents", 4096L)
            .agg(sum("rk")).collect()(0).getLong(0))
        println(f"[probe] $tag%-34s rank=$secs%6.2fs")
        r.unpersist()
      }
    }

    spark.stop()
  }
}
