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

  val all: Seq[GraftQuery] = Seq(hardNegatives, semanticDecontam)
}
