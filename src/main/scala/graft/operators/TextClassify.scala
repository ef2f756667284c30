package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Statistical text classification — a multinomial Naive Bayes
  * classifier TRAINED and APPLIED inside the engine (north-star
  * extension: the learned counterpart of the hand-rule
  * `ns_text_langid` heuristic; the fastText-style quality/language
  * gate every corpus assembly runs is exactly this shape — a linear
  * model over token counts, trained on a labeled split, scored over
  * the full corpus).
  *
  * Label: `lang = 'en'` (binary). Train split: `doc_id % 5 <> 0`;
  * eval split: `doc_id % 5 = 0` — deterministic, content-independent.
  *
  * Scale shape: training is ONE corpus-token shuffle keyed on the
  * token (vocabulary-sized output with map-side partial counts);
  * totals/priors are 1-row aggregates of the vocabulary-sized model
  * frame; scoring broadcasts the weighted model back to the corpus
  * token stream and reduces per-doc — a second corpus shuffle keyed
  * on doc_id. Nothing driver-side anywhere. At a 10M-entry
  * vocabulary swap the broadcast for a shuffle join keyed on the
  * 64-bit token hash (the [[TextOps.perplexity]] pattern — hash
  * equality ≡ string equality at 2⁻⁶⁴); the per-doc reduce is
  * unchanged.
  *
  * Determinism (the float contract): per-token log-likelihood-ratio
  * weights are quantized to INTEGER MICRO-UNITS at the model — each
  * weight is `FLOOR((ln(c⁺+1) − ln(n⁺+V) − ln(c⁻+1) + ln(n⁻+V)) ·
  * 10⁶)` of exact-integer inputs, the identical left-associated
  * expression on both engines — so the per-doc score is an exact
  * BIGINT sum, immune to float accumulation order (stronger than
  * rounding AFTER a double sum: the sum itself is integral). The OOV
  * weight is the same four-ln shape at c⁺ = c⁻ = 0, and the class
  * prior is the same quantization of ln(d⁺) − ln(d⁻).
  */
object TextClassify {

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), (col("lang") === "en").as("pos"),
      explode(split(col("text"), " ")).as("w"))

  /** FLOOR(((ln a − ln b − ln c) + ln d) · 10⁶) as BIGINT — the shared
    * quantizer; identical association to the oracle's expression. */
  private def microLnRatio(a: Column, b: Column, c: Column, d: Column): Column =
    floor((log(a.cast("double")) - log(b.cast("double"))
      - log(c.cast("double")) + log(d.cast("double"))) * 1000000.0).cast("long")

  /** Per-eval-doc NB scores: (doc_id, lang, n_toks, score_micro, pred_en, is_en). */
  def nbClassify(spark: SparkSession, dir: String): DataFrame =
    nbClassifyCore(Tables.documents(spark, dir))

  /** Core on any (doc_id, lang, text) frame, split `doc_id % 5`. */
  def nbClassifyCore(docs: DataFrame): DataFrame =
    nbClassifySplit(docs.where(col("doc_id") % 5 =!= 0),
      docs.where(col("doc_id") % 5 === 0))

  /** Train/eval passed SEPARATELY — the weak-scaling probe grows ONLY
    * the scoring corpus against a genuinely fixed training frame
    * (replicating the whole frame through [[nbClassifyCore]] would
    * grow the training shuffle 10× too and conflate the two costs —
    * r6 advice on ScaleProbeR6b). */
  def nbClassifySplit(trainDocs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val train = tokens(trainDocs)
    val eval = tokens(evalDocs)

    val model = train.groupBy("w").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
    val tot = model.agg(
      sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
      count(lit(1)).as("v"))
    val priors = train.agg(
      countDistinct(when(col("pos"), col("doc_id"))).as("d_pos"),
      countDistinct(when(!col("pos"), col("doc_id"))).as("d_neg"))

    val weighted = model.crossJoin(broadcast(tot))
      .select(col("w"),
        microLnRatio(col("c_pos") + 1, col("n_pos") + col("v"),
          col("c_neg") + 1, col("n_neg") + col("v")).as("w_micro"))
    val scalars = tot.crossJoin(priors)
      .select(
        microLnRatio(lit(1L), col("n_pos") + col("v"),
          lit(1L), col("n_neg") + col("v")).as("w_oov"),
        floor((log(col("d_pos").cast("double"))
          - log(col("d_neg").cast("double"))) * 1000000.0).cast("long").as("prior_micro"))

    eval
      .join(broadcast(weighted), Seq("w"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy(col("doc_id"), col("lang"), col("prior_micro"))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("w_micro"), col("w_oov"))).as("sum_w"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        (col("prior_micro") + col("sum_w")).as("score_micro"),
        (col("prior_micro") + col("sum_w") > 0).as("pred_en"),
        (col("lang") === "en").as("is_en"))
      .orderBy("doc_id")
  }

  val nbClassifyQ: GraftQuery = GraftQuery.checked("ns_text_nb_classify",
    """WITH toks AS (
      SELECT doc_id, lang, (lang = 'en') AS pos, unnest(string_split(text, ' ')) AS w
      FROM documents),
    train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    eval AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
    model AS (
      SELECT w,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
             CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
      FROM train GROUP BY w),
    tot AS (
      SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
             CAST(SUM(c_neg) AS BIGINT) AS n_neg,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM model),
    priors AS (
      SELECT CAST(COUNT(DISTINCT CASE WHEN pos THEN doc_id END) AS BIGINT) AS d_pos,
             CAST(COUNT(DISTINCT CASE WHEN NOT pos THEN doc_id END) AS BIGINT) AS d_neg
      FROM train),
    weighted AS (
      SELECT m.w,
             CAST(FLOOR((ln(CAST(m.c_pos + 1 AS DOUBLE)) - ln(CAST(t.n_pos + t.v AS DOUBLE))
                       - ln(CAST(m.c_neg + 1 AS DOUBLE)) + ln(CAST(t.n_neg + t.v AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS w_micro
      FROM model m CROSS JOIN tot t),
    scalars AS (
      SELECT CAST(FLOOR((ln(CAST(1 AS DOUBLE)) - ln(CAST(t.n_pos + t.v AS DOUBLE))
                       - ln(CAST(1 AS DOUBLE)) + ln(CAST(t.n_neg + t.v AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS w_oov,
             CAST(FLOOR((ln(CAST(p.d_pos AS DOUBLE)) - ln(CAST(p.d_neg AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS prior_micro
      FROM tot t CROSS JOIN priors p)
    SELECT e.doc_id, e.lang, COUNT(*) AS n_toks,
           CAST(s.prior_micro + SUM(COALESCE(wt.w_micro, s.w_oov)) AS BIGINT) AS score_micro,
           CAST(s.prior_micro + SUM(COALESCE(wt.w_micro, s.w_oov)) AS BIGINT) > 0 AS pred_en,
           (e.lang = 'en') AS is_en
    FROM eval e LEFT JOIN weighted wt USING (w) CROSS JOIN scalars s
    GROUP BY e.doc_id, e.lang, s.prior_micro, s.w_oov
    ORDER BY e.doc_id""")((s, d) => nbClassify(s, d))

  val all: Seq[GraftQuery] = Seq(nbClassifyQ)
}
