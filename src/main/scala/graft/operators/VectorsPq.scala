package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.dround
import graft.sources.Tables

/** PRODUCT QUANTIZATION ANN (Jégou et al. 2011) — the codebook member
  * of the ANN family ([[Vectors]] LSH, [[VectorsIvf]]/[[VectorsKmeans]]
  * IVF, [[Vectors]] int8 scalar quant + re-rank): the 64-dim vector
  * splits into [[M]] subvectors, each quantized to one of [[Ks]]
  * per-subspace centroids, so a corpus vector compresses to M small
  * codes (M bytes) and query scoring becomes M table lookups instead
  * of a 64-float dot.
  *
  * Scale shape — why PQ is the 100 TB path:
  *  - TRAIN: [[M]] independent k-means runs over 16-dim slices — the
  *    [[VectorsKmeans]] two-stage Lloyd verbatim (zero-shuffle literal
  *    assignment; model-sized quantized-exact update), model state
  *    M×Ks×16 doubles.
  *  - ENCODE: per-row argmax over codebook literals per subspace — a
  *    pure codegen map fused into the scan, zero shuffle. At rest the
  *    codes column is what a production system would persist: the
  *    256-byte float vector never needs to be scanned again for
  *    candidate generation (4 bytes/vector — a 64× scan-byte cut).
  *  - SCORE (ADC): each query's M×Ks lookup table rides the plan as
  *    ARRAY LITERALS (queries are an nQueries-bounded probe set, the
  *    [[VectorsIvf]] collect contract); approx score =
  *    element_at(lut₀, c₀) + … + element_at(lut₃, c₃) — no join, no
  *    shuffle, codes-only input.
  *  - RE-RANK: only the top-[[Rerank]] candidates per query touch
  *    their float vectors again (candidate-sized join), exact dot,
  *    top-k.
  *
  * Determinism (the oracle contract): training is the quantized-exact
  * BIGINT update → per-subspace codebooks replay bit-identically in
  * SQL; codes use the argmax (v·c − |c|²/2) struct tie-break (ROW_NUMBER
  * score DESC, cid DESC in the oracle); LUT entries are driver-computed
  * left-to-right double dots (the same sequential order as DuckDB's
  * `list_sum(list_transform(list_zip(...)))`); the 4-term approx sum is
  * explicit left-associative addition on BOTH engines (never a SUM
  * aggregate, whose accumulation order is unspecified); candidate and
  * final sets break ties on neighbor_id. Every stage is exact, so the
  * whole pipeline — train → encode → ADC → re-rank — hash-matches.
  */
object VectorsPq {

  val M = 4          // subspaces
  val SubDim = 16    // dims per subspace (M × SubDim = VectorsKmeans.Dim)
  val Ks = 8         // codes per subspace
  val PqIters = 2    // Lloyd rounds per subspace
  val Rerank = 50    // ADC candidates re-ranked exactly, per query
  val NQueries = 5   // probe-set size (shared with the oracle SQL)
  val IvfNProbe = 4  // coarse cells probed per query (IVF-PQ)
  val TopK = 5       // final neighbors per query (shared with the oracle)
  private val Scale = 1000000.0

  /** 1-based slice of subspace `s`. */
  private def sub(v: Column, s: Int): Column = slice(v, s * SubDim + 1, SubDim)

  /** Deterministic per-subspace seed: slices of the first Ks corpus
    * vectors (the [[VectorsKmeans.initialCentroids]] rule). */
  private def initialCodebook(spark: SparkSession, dir: String, s: Int): Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .where(col("vec_id") < Ks)
      .select(col("vec_id").cast("int"), sub(col("embedding"), s))
      .as[(Int, Array[Float])].collect()
      .map { case (cid, v) => cid -> v.toSeq.map(_.toDouble) }
      .sortBy(_._1).toSeq
  }

  /** One Lloyd update on subspace `s` — [[VectorsKmeans.refined]] over
    * the slice: literal-assign (zero shuffle), Ks×SubDim quantized-
    * exact sums (model-sized collect). */
  private def refinedSub(spark: SparkSession, dir: String, s: Int,
                         cents: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] = {
    val sums = Tables.embeddings(spark, dir)
      .withColumn("sv", sub(col("embedding"), s))
      .withColumn("cluster", VectorsKmeans.assignCol(col("sv"), cents))
      .select(col("cluster"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg(sum(floor(col("x").cast("double") * Scale + 0.5).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .collect()
    sums.groupBy(_.getInt(0)).view.mapValues { rows =>
      rows.sortBy(_.getInt(1)).map(r => r.getLong(2) / (Scale * r.getLong(3))).toSeq
    }.toSeq.sortBy(_._1)
  }

  private val trained =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, Seq[Seq[(Int, Seq[Double])]]]]()

  /** [[PqIters]] Lloyd rounds per subspace (memoized per session+dir —
    * the [[VectorsKmeans.train]] convention). */
  def trainPq(spark: SparkSession, dir: String): Seq[Seq[(Int, Seq[Double])]] = {
    val perSession = trained.synchronized {
      var m = trained.get(spark)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; trained.put(spark, m) }
      m
    }
    perSession.getOrElseUpdate(dir,
      (0 until M).map { s =>
        (0 until PqIters).foldLeft(initialCodebook(spark, dir, s))(
          (c, _) => refinedSub(spark, dir, s, c))
      })
  }

  /** Corpus codes: M argmax-over-literal columns, fused into the scan. */
  private[graft] def encoded(spark: SparkSession, dir: String,
                             books: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val codeCols = (0 until M).map(s =>
      VectorsKmeans.assignCol(sub(col("embedding"), s), books(s)).as(s"c$s"))
    Tables.embeddings(spark, dir).select(col("vec_id") +: codeCols: _*)
  }

  /** The shuffle-free candidate-scoring stage: scan -> encode projection
    * -> per-query ADC explode. Exposed for the plan pin (PlanShapeSpec
    * asserts it contains NO exchange — candidate generation must stay
    * map-side; only the top-R selection afterwards shuffles, on
    * query_id). */
  private[graft] def adcScored(spark: SparkSession, dir: String,
                               books: Seq[Seq[(Int, Seq[Double])]],
                               perQuery: Seq[Column]): DataFrame =
    encoded(spark, dir, books)
      .select(col("vec_id"), explode(array(perQuery: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("vec_id").as("neighbor_id"),
        col("qs.approx").as("approx"))
      .where(col("neighbor_id") =!= col("query_id"))

  /** One query's ADC score as a column over the code columns c0..c3:
    * element_at over a Ks-sized double-literal LUT per subspace, the
    * four terms added left-to-right (explicit, order-pinned). LUT is
    * indexed by cid POSITION (0..maxCid), zero-filled where a cluster
    * emptied during training — assignCol never emits a missing cid,
    * but element_at(cid+1) must still line up. */
  private[graft] def adcScoreCol(books: Seq[Seq[(Int, Seq[Double])]],
                                 qv: Seq[Double]): Column =
    (0 until M).map { s =>
      val qSlice = qv.slice(s * SubDim, (s + 1) * SubDim)
      val byCid = books(s).map { case (cid, c) =>
        cid -> qSlice.zip(c).map { case (a, b) => a * b }.sum // left-to-right, = list_sum order
      }.toMap
      val lut = (0 to books(s).map(_._1).max).map(byCid.getOrElse(_, 0.0))
      element_at(array(lut.map(lit): _*), col(s"c$s") + 1)
    }.reduce(_ + _)

  /** Per-query ADC score columns (LUT literals over the code columns);
    * shared by [[pqTopK]] and the plan pin. */
  private[graft] def adcPerQuery(books: Seq[Seq[(Int, Seq[Double])]],
                                 queries: Seq[(Long, Seq[Double])]): Seq[Column] =
    queries.map { case (qid, qv) =>
      struct(lit(qid).as("query_id"), adcScoreCol(books, qv).as("approx"))
    }

  /** ADC + exact re-rank top-k. `rerank >= corpus size` degrades to the
    * exact brute force (the spec's losslessness corner). */
  def pqTopK(spark: SparkSession, dir: String, nQueries: Int = NQueries, k: Int = TopK,
             rerank: Int = Rerank): DataFrame = {
    val books = trainPq(spark, dir)
    val queries = collectQueries(spark, dir, nQueries)
    val scored = adcScored(spark, dir, books, adcPerQuery(books, queries))
    rerankTail(spark, dir, scored, queries, k, rerank)
  }

  /** The probe set, collected driver-side (nQueries rows — the
    * [[VectorsIvf]] collect contract), floats widened exactly. */
  private[graft] def collectQueries(spark: SparkSession, dir: String,
                             nQueries: Int): Seq[(Long, Seq[Double])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .where(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, v) => qid -> v.toSeq.map(_.toDouble) }
      .sortBy(_._1).toSeq
  }

  /** Top-`rerank` by (approx DESC, id), exact dot on the candidates
    * only, top-k by (sim DESC, id) — the shared tail of [[pqTopK]] and
    * [[ivfPqTopK]]. */
  private def rerankTail(spark: SparkSession, dir: String, scored: DataFrame,
                         queries: Seq[(Long, Seq[Double])], k: Int, rerank: Int): DataFrame = {
    import spark.implicits._
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("approx").desc, col("neighbor_id"))
    val cands = scored.withColumn("rn", row_number().over(wApprox))
      .where(col("rn") <= rerank)
      .select("query_id", "neighbor_id")
    val qEmb = queries.toDF("query_id", "q_emb")
    val exact = cands
      .join(Tables.embeddings(spark, dir).select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dround(aggregate(zip_with(col("n_emb"), col("q_emb"),
          (x, y) => x.cast("double") * y), lit(0.0), (a, p) => a + p), 4).as("sim_r"))
    Vectors.rankTail(exact, k)
  }

  // ---- IVF-PQ: coarse cells prune, PQ codes score, exact re-rank -------

  /** Probe cells per query against the trained coarse quantizer:
    * top-nProbe cids by (q·c − |c|²/2), ties broken max cid — the
    * [[VectorsKmeans.assignCol]] tie-break generalized to nProbe, and
    * the ORDER the oracle mirrors as ROW_NUMBER (score DESC, cid
    * DESC). Computed driver-side: both operands are already
    * driver-resident model state (queries = the probe-set collect,
    * centroids = K×Dim), so the cell filter rides the plan as
    * per-query literal lists — candidate generation stays map-side. */
  private def probeCells(cents: Seq[(Int, Seq[Double])],
                         queries: Seq[(Long, Seq[Double])], nProbe: Int): Map[Long, Seq[Int]] =
    queries.map { case (qid, qv) =>
      qid -> cents.map { case (cid, c) =>
        (qv.zip(c).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2, cid)
      }.sortBy { case (sc, cid) => (-sc, -cid) }.take(nProbe).map(_._2)
    }.toMap

  /** IVF-PQ ANN — the production composition (Jégou et al. 2011 §V):
    * the [[VectorsKmeans]]-trained coarse quantizer prunes the corpus
    * to nProbe cells per query, PQ codes ADC-score only the
    * survivors, exact re-rank on the top-`rerank`. Candidate
    * generation is STILL map-side only: cell id and codes are literal
    * argmaxes fused into the scan, and the probe-cell filter is a
    * per-query literal IN-list — a vector outside every probe cell
    * costs one boolean test, never a join or shuffle. */
  def ivfPqTopK(spark: SparkSession, dir: String, nQueries: Int = NQueries, k: Int = TopK,
                nProbe: Int = IvfNProbe, rerank: Int = Rerank): DataFrame = {
    val books = trainPq(spark, dir)
    val queries = collectQueries(spark, dir, nQueries)
    val scored = ivfAdcScored(spark, dir, books, queries, nProbe)
    rerankTail(spark, dir, scored, queries, k, rerank)
  }

  /** The IVF-PQ candidate-scoring stage (cell filter + ADC), exposed
    * like [[adcScored]] so the spec can assert the cells-only-prune
    * invariant: this frame must be a SUBSET of the unfiltered PQ
    * [[adcScored]] frame with identical approx scores — the coarse
    * quantizer may only remove candidates, never rescore them. */
  private[graft] def ivfAdcScored(spark: SparkSession, dir: String,
                                  books: Seq[Seq[(Int, Seq[Double])]],
                                  queries: Seq[(Long, Seq[Double])],
                                  nProbe: Int): DataFrame = {
    val cents = VectorsKmeans.train(spark, dir)
    val probes = probeCells(cents, queries, nProbe)
    val codeCols = (0 until M).map(s =>
      VectorsKmeans.assignCol(sub(col("embedding"), s), books(s)).as(s"c$s"))
    val enc = Tables.embeddings(spark, dir).select(
      col("vec_id") +: VectorsKmeans.assignCol(col("embedding"), cents).as("cell") +: codeCols: _*)
    val perQuery = queries.map { case (qid, qv) =>
      struct(lit(qid).as("query_id"), adcScoreCol(books, qv).as("approx"),
        col("cell").isin(probes(qid): _*).as("probed"))
    }
    enc
      .select(col("vec_id"), explode(array(perQuery: _*)).as("qs"))
      .where(col("qs.probed") && col("vec_id") =!= col("qs.query_id"))
      .select(col("qs.query_id").as("query_id"), col("vec_id").as("neighbor_id"),
        col("qs.approx").as("approx"))
  }

  // ---- oracle: replay train → encode → ADC → re-rank in SQL ------------

  /** Subspace slice of the embedding list (1-based, inclusive). */
  private def subSql(expr: String, s: Int): String =
    s"$expr[${s * SubDim + 1}:${(s + 1) * SubDim}]"

  /** One Lloyd round on subspace `s` (the [[VectorsKmeans]] iterSql
    * with the slice and SubDim). */
  private def pqIterSql(s: Int, i: Int): String =
    s"""pscore${s}_$i AS (
      SELECT e.vec_id, c.cid,
             list_sum(list_transform(list_zip(${subSql("e.embedding", s)}, c.cemb),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
             - list_sum(list_transform(c.cemb, x -> x * x)) / 2 AS score
      FROM embeddings e CROSS JOIN pcents${s}_$i c),
    passign${s}_$i AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
        FROM pscore${s}_$i) WHERE rn = 1),
    pcents${s}_${i + 1} AS (
      SELECT cluster AS cid,
             list(CAST(sq AS DOUBLE) / (1000000.0 * n) ORDER BY pos) AS cemb
      FROM (
        SELECT a.cluster, t.i AS pos,
               SUM(CAST(FLOOR(CAST(${subSql("e.embedding", s)}[t.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sq,
               COUNT(*) AS n
        FROM passign${s}_$i a JOIN embeddings e USING (vec_id) CROSS JOIN range(1, ${SubDim + 1}) t(i)
        GROUP BY a.cluster, t.i)
      GROUP BY cluster)"""

  /** Per-subspace codebook training CTEs (pcents{s}_{PqIters} final). */
  private def pqTrainCtes: String = (0 until M).map { s =>
    s"""pcents${s}_0 AS (
      SELECT CAST(vec_id AS INTEGER) AS cid,
             list_transform(${subSql("embedding", s)}, x -> CAST(x AS DOUBLE)) AS cemb
      FROM embeddings WHERE vec_id < $Ks),
    ${(0 until PqIters).map(i => pqIterSql(s, i)).mkString(",\n    ")}"""
  }.mkString(",\n    ")

  /** Encode (pcode{s}) + query LUT (plut{s}) CTEs per subspace. */
  private def pqCodeLutCtes: String = (0 until M).map { s =>
      s"""pcode$s AS (
      SELECT vec_id, cid AS code FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(list_zip(${subSql("e.embedding", s)}, c.cemb),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                 - list_sum(list_transform(c.cemb, x -> x * x)) / 2 DESC, c.cid DESC) AS rn
        FROM embeddings e CROSS JOIN pcents${s}_$PqIters c) WHERE rn = 1),
    plut$s AS (
      SELECT q.vec_id AS query_id, c.cid AS code,
             list_sum(list_transform(list_zip(${subSql("q.embedding", s)}, c.cemb),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS d
      FROM embeddings q CROSS JOIN pcents${s}_$PqIters c
      WHERE q.vec_id < $NQueries)"""
  }.mkString(",\n    ")

  /** Shared ADC→re-rank tail SQL: top-$Rerank candidates from
    * `approx`, exact dot, top-$TopK. */
  private def rerankTailSql: String =
    s"""cands AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY approx DESC, neighbor_id) AS rn
        FROM approx) WHERE rn <= $Rerank),
    exact AS (
      SELECT c.query_id, c.neighbor_id,
             ROUND(list_sum(list_transform(list_zip(n.embedding, q.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 4) AS sim_r
      FROM cands c
      JOIN embeddings n ON n.vec_id = c.neighbor_id
      JOIN embeddings q ON q.vec_id = c.query_id)
    SELECT query_id, neighbor_id, sim_r FROM (
      SELECT query_id, neighbor_id, sim_r,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY sim_r DESC, neighbor_id) AS rn
      FROM exact) WHERE rn <= $TopK
    ORDER BY query_id, sim_r DESC, neighbor_id"""

  private def oracleSql: String = {
    s"""WITH $pqTrainCtes,
    $pqCodeLutCtes,
    approx AS (
      SELECT q.query_id, e0.vec_id AS neighbor_id,
             l0.d + l1.d + l2.d + l3.d AS approx
      FROM (SELECT DISTINCT query_id FROM plut0) q
      CROSS JOIN pcode0 e0
      JOIN pcode1 e1 ON e1.vec_id = e0.vec_id
      JOIN pcode2 e2 ON e2.vec_id = e0.vec_id
      JOIN pcode3 e3 ON e3.vec_id = e0.vec_id
      JOIN plut0 l0 ON l0.query_id = q.query_id AND l0.code = e0.code
      JOIN plut1 l1 ON l1.query_id = q.query_id AND l1.code = e1.code
      JOIN plut2 l2 ON l2.query_id = q.query_id AND l2.code = e2.code
      JOIN plut3 l3 ON l3.query_id = q.query_id AND l3.code = e3.code
      WHERE e0.vec_id <> q.query_id),
    $rerankTailSql"""
  }

  /** IVF-PQ oracle: the coarse-quantizer replay ([[VectorsKmeans]]
    * seed + iterSql rounds), corpus cell assignment + per-query probe
    * cells (ROW_NUMBER score DESC, cid DESC — the driver-side
    * probeCells order), then the PQ pipeline restricted to probed
    * cells. */
  private def ivfPqOracleSql: String = {
    val km = VectorsKmeans
    s"""WITH cents0 AS (
      SELECT CAST(vec_id AS INTEGER) AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
      FROM embeddings WHERE vec_id < ${km.K}),
    ${(0 until km.Iters).map(km.iterSql).mkString(",\n    ")},
    cellassign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(list_zip(e.embedding, c.cemb),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                 - list_sum(list_transform(c.cemb, x -> x * x)) / 2 DESC, c.cid DESC) AS rn
        FROM embeddings e CROSS JOIN cents${km.Iters} c) WHERE rn = 1),
    probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(list_zip(q.embedding, c.cemb),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                 - list_sum(list_transform(c.cemb, x -> x * x)) / 2 DESC, c.cid DESC) AS rn
        FROM embeddings q CROSS JOIN cents${km.Iters} c
        WHERE q.vec_id < $NQueries) WHERE rn <= $IvfNProbe),
    $pqTrainCtes,
    $pqCodeLutCtes,
    approx AS (
      SELECT q.query_id, e0.vec_id AS neighbor_id,
             l0.d + l1.d + l2.d + l3.d AS approx
      FROM (SELECT DISTINCT query_id FROM plut0) q
      CROSS JOIN pcode0 e0
      JOIN cellassign ca ON ca.vec_id = e0.vec_id
      JOIN probes pr ON pr.query_id = q.query_id AND pr.cell = ca.cell
      JOIN pcode1 e1 ON e1.vec_id = e0.vec_id
      JOIN pcode2 e2 ON e2.vec_id = e0.vec_id
      JOIN pcode3 e3 ON e3.vec_id = e0.vec_id
      JOIN plut0 l0 ON l0.query_id = q.query_id AND l0.code = e0.code
      JOIN plut1 l1 ON l1.query_id = q.query_id AND l1.code = e1.code
      JOIN plut2 l2 ON l2.query_id = q.query_id AND l2.code = e2.code
      JOIN plut3 l3 ON l3.query_id = q.query_id AND l3.code = e3.code
      WHERE e0.vec_id <> q.query_id),
    $rerankTailSql"""
  }

  val pqTopKQ: GraftQuery =
    GraftQuery.checked("ns_vec_topk_pq", oracleSql)((s, d) => pqTopK(s, d))

  val ivfPqTopKQ: GraftQuery =
    GraftQuery.checked("ns_vec_topk_ivfpq", ivfPqOracleSql)((s, d) => ivfPqTopK(s, d))

  val all: Seq[GraftQuery] = Seq(pqTopKQ, ivfPqTopKQ)
}
