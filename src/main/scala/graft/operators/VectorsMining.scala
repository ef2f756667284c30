package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.dround
import graft.sources.Tables

/** Embedding-space MINING operators — the two lookups an
  * embedding-training / eval-hygiene pipeline runs beyond plain ANN:
  *
  *  - [[hardNegatives]]: per query, the most-similar vectors with a
  *    DIFFERENT label — contrastive-training hard negatives (the
  *    batch-mining step of every sentence-embedding recipe since
  *    Schroff et al.'s FaceNet triplet mining).
  *  - [[semanticDecontam]]: for each held-out eval vector, its nearest
  *    TRAIN vector and a contamination flag at cosine ≥ τ — the
  *    embedding-space complement of the n-gram/Bloom decontamination
  *    family (`ns_dedup_decontam*`), catching paraphrased leakage that
  *    token overlap misses.
  *
  * Scale: both are broadcast-probe shapes. Hard negatives broadcasts
  * the (small) query set; semantic decontam broadcasts the EVAL set —
  * eval suites are model-sized by construction, which is exactly why
  * this direction (probe eval against the corpus, not the reverse) is
  * the one that scales: one map pass over the train side, per-row
  * max-of-broadcast, no shuffle until the eval-sized final order.
  * Embeddings are L2-normalized (TESTDATA.md), so cosine = dot. */
object VectorsMining {

  /** Top-3 different-label neighbors for query vectors 0..7, ranked by
    * ROUND(sim, 4) with neighbor-id tie-break (the exact-topk ordering
    * contract both engines share). */
  val hardNegatives: GraftQuery = GraftQuery.checked("ns_vec_hard_negatives",
    """WITH pairs AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, v.label AS neg_label,
             ROUND(list_sum(list_transform(list_zip(q.embedding, v.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 4) AS sim_r
      FROM embeddings q JOIN embeddings v
        ON q.vec_id < 8 AND v.label <> q.label),
    ranked AS (
      SELECT query_id, neighbor_id, neg_label, sim_r,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rn
      FROM pairs)
    SELECT query_id, neighbor_id, neg_label, sim_r FROM ranked WHERE rn <= 3
    ORDER BY query_id, sim_r DESC, neighbor_id""") { (spark, dir) =>
    hardNegativesCore(spark, Tables.embeddings(spark, dir))
  }

  /** Bounded-aggregator ranking (r7 verdict #2): the corpus×Q pair
    * stream reduces through [[graft.functions.TopKAggregator]] — O(k)
    * state per query with MAP-SIDE partials, so the only exchange is Q
    * partial buffers per task, never the full pair stream funneled
    * into Q reducer partitions for a `row_number` sort (the window
    * form, kept as [[hardNegativesWindow]], is spec-pinned equal —
    * the `ns_vec_topk_window` pattern). `neg_label` joins back AFTER
    * ranking: only the Q·k winners (a KB-sized frame, broadcast) touch
    * the label column, so ranking ships (id, score) pairs only. */
  private[graft] def hardNegativesCore(
      spark: org.apache.spark.sql.SparkSession,
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.functions.{ScoredId, TopKAggregator}
    val q = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val agg = new TopKAggregator(3).toColumn
    val top = emb.join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("query_id"),
        col("vec_id").as("id"),
        dround(Vectors.dot(col("q_emb"), col("embedding")), 4).as("score"))
      .as[(Long, Long, Double)]
      .map { case (qid, id, score) => (qid, ScoredId(id, score)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (qid, t) => t.map(s => (qid, s.id, s.score)) }
      .toDF("query_id", "neighbor_id", "sim_r")
    emb.select(col("vec_id").as("neighbor_id"), col("label").as("neg_label"))
      .join(broadcast(top), Seq("neighbor_id"))
      .select("query_id", "neighbor_id", "neg_label", "sim_r")
      .orderBy(col("query_id"), col("sim_r").desc, col("neighbor_id"))
  }

  /** The window-ranking formulation — mirrors the oracle SQL 1:1;
    * kept ONLY as the spec twin of [[hardNegativesCore]] (at scale it
    * funnels the corpus×Q pair stream into Q reducer partitions). */
  private[graft] def hardNegativesWindow(
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val q = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val pairs = emb.join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("label").as("neg_label"),
        dround(Vectors.dot(col("q_emb"), col("embedding")), 4).as("sim_r"))
    val w = Window.partitionBy("query_id").orderBy(col("sim_r").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("query_id", "neighbor_id", "neg_label", "sim_r")
      .orderBy(col("query_id"), col("sim_r").desc, col("neighbor_id"))
  }

  /** Eval-set semantic contamination report: eval = `vec_id % 10 = 7`
    * (the deterministic held-out slice), train = the rest. Per eval
    * vector: nearest train vector, rounded cosine, and the flag at
    * τ = 0.8 (the near-dup threshold the repo's cosine dedup uses).
    * Always non-empty — a report, not just a violations guard. */
  val semanticDecontam: GraftQuery = GraftQuery.checked("ns_vec_decontam_semantic",
    """WITH ev AS (
      SELECT vec_id AS eval_id, embedding AS e_emb FROM embeddings WHERE vec_id % 10 = 7),
    pairs AS (
      SELECT ev.eval_id, t.vec_id AS train_id,
             ROUND(list_sum(list_transform(list_zip(ev.e_emb, t.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 4) AS sim_r
      FROM ev JOIN embeddings t ON t.vec_id % 10 <> 7),
    ranked AS (
      SELECT eval_id, train_id, sim_r,
             ROW_NUMBER() OVER (PARTITION BY eval_id ORDER BY sim_r DESC, train_id) AS rn
      FROM pairs)
    SELECT eval_id, train_id AS nearest_train_id, sim_r,
           CAST(sim_r >= 0.8 AS BOOLEAN) AS contaminated
    FROM ranked WHERE rn = 1
    ORDER BY eval_id""") { (spark, dir) =>
    semanticDecontamCore(Tables.embeddings(spark, dir))
  }

  /** Core on any (vec_id, embedding) frame — the weak-scaling probe
    * grows the train side against the fixed %10==7 eval slice.
    *
    * argmax as a PARTIAL-AGGREGATED max-of-struct, not a window: the
    * train×eval inflation reduces map-side to one row per (task,
    * eval_id) before the eval-sized exchange — the 100 TB shape.
    * struct order (sim_r, -train_id): max picks highest sim, then
    * LOWEST train id — the oracle's (sim DESC, train_id) tie-break. */
  def semanticDecontamCore(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ev = emb.where(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
    emb.where(col("vec_id") % 10 =!= 7)
      .join(broadcast(ev), lit(true))
      .select(col("eval_id"), col("vec_id").as("train_id"),
        dround(Vectors.dot(col("e_emb"), col("embedding")), 4).as("sim_r"))
      .groupBy("eval_id")
      .agg(max(struct(col("sim_r"), (-col("train_id")).as("neg_id"))).as("m"))
      .select(col("eval_id"), (-col("m.neg_id")).as("nearest_train_id"),
        col("m.sim_r").as("sim_r"), (col("m.sim_r") >= 0.8).as("contaminated"))
      .orderBy("eval_id")
  }

  /** MARGIN-BASED PAIR MINING — the bitext-mining criterion of
    * Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus Mining with
    * Multilingual Sentence Embeddings", the LASER/CCMatrix recipe):
    * raw cosine over-pairs "hub" vectors that are close to everything,
    * so each candidate pair (x, y) is scored by its cosine RELATIVE to
    * the two endpoints' average k-NN cosines —
    * margin(x, y) = cos(x, y) / ((avgₖ(x) + avgₖ(y)) / 2) — and only
    * ratios above 1 are mined. Sides here are the corpus's parity
    * halves (even vec_id = "source", odd = "target"); queries are the
    * bounded even slice < 32 (the repo's top-k query convention; at
    * 100 TB the query side streams through the same plan and avgₖ(y)
    * is unchanged since it is computed ROW-LOCALLY).
    *
    * Exact-integer contract: cosines quantize to micro units
    * (`round(dround(cos, 4)·1e4)`), the k-NN sums are BIGINT sums of 4
    * integers (order-free), and the margin is
    * `floor(cosm·8/(sx4+sy4)·1e6)` — one deterministic IEEE division
    * of exact integers, so both engines emit identical BIGINTs.
    *
    * Scale shape: the query matrix ships as Q literal vectors; each
    * target row computes its Q cosines AND its own top-4 sum in one
    * map (zero shuffle for avgₖ(y) — the corpus side never groups);
    * avgₖ(x) reduces through the bounded [[graft.functions.TopKAggregator]]
    * (Q groups, O(k) state); the final top-1-per-query is a native
    * `max_by` over struct keys — O(1) state, map-side partials, and it
    * carries the winner's cosine so nothing joins back against the
    * pair stream. No corpus-keyed exchange anywhere. */
  val marginPairs: GraftQuery = GraftQuery.checked("ns_vec_margin_pairs",
    """WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id % 2 = 0 AND vec_id < 32),
    b AS (SELECT vec_id AS yid, embedding AS ye FROM embeddings WHERE vec_id % 2 = 1),
    pairs AS (
      SELECT q.qid, b.yid,
             CAST(ROUND(ROUND(list_sum(list_transform(list_zip(q.qe, b.ye),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 4) * 10000) AS BIGINT) AS cosm
      FROM q CROSS JOIN b),
    sx AS (SELECT qid, CAST(SUM(cosm) AS BIGINT) AS sx4 FROM (
             SELECT qid, cosm,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosm DESC, yid) AS rn
             FROM pairs) WHERE rn <= 4 GROUP BY qid),
    sy AS (SELECT yid, CAST(SUM(cosm) AS BIGINT) AS sy4 FROM (
             SELECT yid, cosm,
                    ROW_NUMBER() OVER (PARTITION BY yid ORDER BY cosm DESC, qid) AS rn
             FROM pairs) WHERE rn <= 4 GROUP BY yid),
    m AS (SELECT p.qid, p.yid, p.cosm,
                 CAST(FLOOR(CAST(p.cosm * 8 AS DOUBLE) / (sx.sx4 + sy.sy4) * 1000000) AS BIGINT)
                   AS margin_micro
          FROM pairs p JOIN sx USING (qid) JOIN sy USING (yid)
          WHERE sx.sx4 + sy.sy4 > 0),
    best AS (SELECT qid, yid, cosm, margin_micro,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY margin_micro DESC, yid) AS rn
             FROM m)
    SELECT qid AS query_id, yid AS pair_id, cosm AS cos_micro, margin_micro
    FROM best WHERE rn = 1 AND margin_micro > 1000000
    ORDER BY query_id""") { (spark, dir) =>
    import spark.implicits._
    import graft.functions.{ScoredId, TopKAggregator}
    val emb = Tables.embeddings(spark, dir)
    // Q-bounded static query slice — memoized like TimeSeries'
    // `ts:queries` (r15: every run re-scanned the embeddings parquet
    // just to re-collect the same 16 query vectors); the per-call
    // collect reads the 16-row cache
    val qRows = OpMemo.cached(spark, dir, "vec:margin-queries") {
      emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 32)
        .select("vec_id", "embedding")
    }.collect().sortBy(_.getLong(0))
    val qIds = qRows.map(_.getLong(0))
    val qIdArr = array(qIds.map(lit).toIndexedSeq: _*)
    // per-target-row cosines vs EVERY query (native codegen'd dots
    // against literal query vectors), as micro-unit BIGINTs
    val cosCols = qRows.map { r =>
      val qv = array(r.getSeq[Float](1).map(lit).toIndexedSeq: _*)
      round(dround(Vectors.dot(qv, col("embedding")), 4) * 10000).cast("long")
    }
    val targets = emb.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("yid"), array(cosCols.toIndexedSeq: _*).as("cm"))
      // avg-k(y) sum, ROW-LOCALLY: top-4 of this row's own Q cosines
      .withColumn("sy4", expr("aggregate(slice(array_sort(cm, (a, b) -> case when a > b then -1 when a < b then 1 else 0 end), 1, 4), 0L, (acc, x) -> acc + x)"))
    val pairs = targets
      .select(col("yid"), col("sy4"), posexplode(col("cm")).as(Seq("pos", "cosm")))
      .select(element_at(qIdArr, col("pos") + 1).as("qid"),
        col("yid"), col("cosm"), col("sy4"))
    // avg-k(x) sum via the bounded aggregator (Q groups, O(4) state)
    val topk4 = new TopKAggregator(4).toColumn
    val sx = pairs.select(col("qid"), col("yid"), col("cosm"))
      .as[(Long, Long, Long)]
      .map { case (q, y, c) => (q, ScoredId(y, c.toDouble)) }
      .groupByKey(_._1).mapValues(_._2).agg(topk4.name("topk"))
      .map { case (q, tk) => (q, tk.map(_.score.toLong).sum) }
      .toDF("qid", "sx4")
    val margins = pairs.join(broadcast(sx), Seq("qid"))
      .where(col("sx4") + col("sy4") > 0)
      .select(col("qid"), col("yid"), col("cosm"),
        floor((col("cosm") * 8).cast("double") / (col("sx4") + col("sy4")) * 1000000)
          .cast("long").as("margin_micro"))
    // top-1 per query by (margin DESC, yid ASC) as ONE native max_by
    // over struct keys — O(1) state per group with map-side partials,
    // the same bounded-aggregate scale contract as the typed top-1
    // aggregator it replaces. r15 (measured: this row was DRIVER-bound,
    // wall ≈ 2.5 s vs 1.4 s of task time per run): the typed
    // groupByKey top-1 plus the winner join-back planted the corpus
    // cosine subtree in the plan THREE times (sx pass, best pass,
    // join-back pass) and added two object-serialization boundaries;
    // max_by carries the winner's cosine through the aggregate, so the
    // cosine map now executes exactly twice (the irreducible sx pass +
    // this one) and nothing joins back. (yid is unique per group, so
    // the lexicographic (margin, -yid) key has no ties and max_by is
    // deterministic; exact BIGINTs replace the aggregator's double
    // scores — identical ordering, margins are ~1e7 ≪ 2^53.)
    margins
      .groupBy(col("qid").as("query_id"))
      .agg(max_by(
        struct(col("yid"), col("cosm"), col("margin_micro")),
        struct(col("margin_micro"), (-col("yid")).as("neg_yid"))).as("b"))
      .select(col("query_id"), col("b.yid").as("pair_id"),
        col("b.cosm").as("cos_micro"), col("b.margin_micro").as("margin_micro"))
      .where(col("margin_micro") > 1000000L)
      .orderBy("query_id")
  }

  val all: Seq[GraftQuery] = Seq(hardNegatives, semanticDecontam, marginPairs)
}
