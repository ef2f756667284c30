package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Plan-quality regression tests: assert the physical-plan properties
  * the 100 TB design depends on (predicate pushdown, column pruning,
  * broadcast dimensions, window-group-limit) so a refactor can't
  * silently regress them.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("k19: shipdate predicate pushed to parquet, schema pruned") {
    val p = plan(Analytics.pricingSummary.run(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown:\n$p")
    assert(!p.contains("l_orderkey"), "schema should prune unused columns")
  }

  test("k20: dimension joins broadcast, region filter pushed") {
    val p = plan(Analytics.revenueByNation.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"), "region filter should push to scan")
    assert(!p.contains("SortMergeJoin"), "no SMJ expected at dimension sizes")
  }

  test("k21: top-k per group plans WindowGroupLimit below the sort") {
    val p = plan(Analytics.topOrdersPerPriority.run(spark, dir))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }

  test("k10: history page plans TakeOrderedAndProject (no full sort)") {
    val p = plan(graft.operators.MetaQueries.historyPage.run(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("k01: COUNT(*) is pushed into the v2 parquet scan (footer metadata, no row scan)") {
    val prev = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val p = plan(Analytics.tableCountsViaScan(spark, dir))
      assert(p.contains("PushedAggregation: [COUNT(*)]"),
        s"expected aggregate pushdown in scan:\n$p")
    } finally spark.conf.set("spark.sql.parquet.aggregatePushdown", prev)
  }

  test("ns_vec_topk: bounded aggregator plan — ObjectHashAggregate, no full-pair window sort") {
    val p = plan(graft.operators.Vectors.topK.run(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate (O(k) state):\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window ("),
      s"top-k must not rank all Q·N pairs through a window sort:\n$p")
  }

  test("ns_text_ccnet_buckets: tercile rank windows partition by (lang, bin) — never lang alone, no NTILE (r7 verdict)") {
    val p = plan(graft.operators.TextSelection.ccnetBuckets.run(spark, dir))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected window specs in ccnet plan:\n$p")
    // a lang-only window = one reducer sorting that language's whole
    // corpus (at 100 TB the English partition IS the crawl); every
    // data-plane window must carry the logp bin key. The per-lang
    // OFFSETS window passes too: its frame is #langs × #bins rows and
    // it orders by bin, so 'bin#' appears in its spec.
    val langOnly = specs.filter(s => s.contains("lang#") && !s.contains("bin#"))
    assert(langOnly.isEmpty, s"lang-only window spec(s) found: $langOnly\n$p")
    assert(!p.toLowerCase.contains("ntile"),
      s"tercile assignment must use the rank identity, not NTILE:\n$p")
  }

  test("ns_vec_hard_negatives: bounded aggregator — query set broadcasts, no pair-stream window sort (r7 verdict)") {
    val p = plan(graft.operators.VectorsMining.hardNegatives.run(spark, dir))
    assert(p.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate (O(k) state, map-side partials):\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"ranking must not funnel the corpus×Q pair stream into Q window partitions:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the query set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must never SMJ here:\n$p")
  }

  test("ns_vec_topk_pq: ADC candidate scoring is shuffle-free (scan -> encode -> LUT explode)") {
    import org.apache.spark.sql.functions.col
    val pq = graft.operators.VectorsPq
    val books = pq.trainPq(spark, dir)
    import spark.implicits._
    val queries = graft.sources.Tables.embeddings(spark, dir)
      .where(col("vec_id") < pq.NQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (q, v) => q -> v.toSeq.map(_.toDouble) }.sortBy(_._1).toSeq
    val p = plan(pq.adcScored(spark, dir, books, pq.adcPerQuery(books, queries)))
    assert(!p.contains("Exchange"),
      s"ADC candidate generation must be map-side only (codes + LUT literals):\n$p")
    assert(!p.contains("Join"), s"ADC scoring must not join:\n$p")
  }

  test("ns_text_pack: cumsum windows partition by (lang, chunk), never lang alone") {
    val p = plan(graft.operators.TextOps.pack.run(spark, dir))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected window specs in pack plan:\n$p")
    // every data-plane window must include the chunk key; a lang-only
    // window is the single-reducer-per-language scale killer (round 2)
    val langOnly = specs.filter(s => s.contains("lang#") && !s.contains("chunk#"))
    assert(langOnly.isEmpty, s"lang-only window spec(s) found: $langOnly")
  }

  test("ns_text_mixture: rate table broadcasts; no shuffle join on the corpus side") {
    val p = plan(graft.operators.TextOps.mixture.run(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected the per-source rate table to broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge against a tiny rate table:\n$p")
  }

  test("ns_text_quality_filter: one map stage — no exchange except the output sort") {
    val p = plan(graft.operators.TextOps.qualityFilter.run(spark, dir))
    // the verdict itself must be computed scan-side: the only exchange
    // is the output sort's range partitioning — a hash exchange before
    // it would mean the signals stopped being per-row column algebra
    assert(p.contains("rangepartitioning"), s"expected the output sort's range exchange:\n$p")
    assert(!p.contains("hashpartitioning"), s"no hash exchange expected before the sort:\n$p")
  }

  test("ns_text_tfidf: vocabulary-sized df side broadcasts back to the corpus") {
    val p = plan(graft.operators.TextOps.tfidf.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected df-side broadcast:\n$p")
  }

  test("ns_vec_topk_ivf_kmeans: centroid frame and probe side broadcast; corpus never SMJs") {
    val p = plan(graft.operators.VectorsKmeans.ivfKmeansTopK(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not sort-merge against model-sized sides:\n$p")
    // cell assignment must be the assignCol codegen map fused into the
    // scan, never a crossJoin + per-vec_id window over the full corpus
    // (round-4 verdict #1): every window spec partitions on the
    // nQueries-sized probe/result slice (query_id), none on vec_id
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected probe-ranking window specs:\n$p")
    val corpusWide = specs.filter(s => s.contains("vec_id#"))
    assert(corpusWide.isEmpty, s"corpus-wide window spec(s) found: $corpusWide")
  }

  test("ns_dedup_decontam_bloom: the bloom prefilter evaluates scan-side, before the distinct") {
    val p = plan(graft.operators.Dedup.ngramDecontamBloom(spark, SparkSuite.sfDir))
    // the literal filter must sit under the gram distinct (HashAggregate),
    // i.e. appear as a Filter containing shiftright probes, not after
    // any exchange of raw grams
    assert(p.contains("shiftright"), s"expected bloom bit probes in the plan:\n$p")
    val filterIdx = p.indexOf("shiftright")
    val aggIdx = p.indexOf("HashAggregate")
    assert(filterIdx >= 0 && aggIdx >= 0,
      s"expected both bloom filter and distinct aggregate:\n$p")
  }

  test("ns_dedup_spans: only the per-doc window, never a gram-keyed one") {
    val p = plan(graft.operators.Dedup.duplicatedSpans(spark, dir))
    // the occurrence count must be groupBy+join (partial-agg +
    // AQE-skew-splittable), NOT `count over (partition by g)` — window
    // partitions can't be skew-split; the only Window is the per-doc
    // gaps-and-islands ordered by pos
    val windows = p.linesIterator.filter(_.contains("Arguments: [row_number()")).toList
    assert(windows.nonEmpty, s"expected the per-doc island window:\n$p")
    assert(windows.forall(w => w.contains("doc_id#")),
      s"island window must partition by doc_id:\n$windows")
    assert(!p.linesIterator.exists(l => l.contains("windowspecdefinition(g#")),
      s"gram-keyed window found (un-skew-splittable):\n$p")
    assert(p.contains("HashAggregate"), s"expected partial-agg gram counts:\n$p")
  }

  test("ns_text_chunk: pure map stage — no join, no agg, no mid-plan exchange") {
    val p = plan(graft.operators.TextOps.chunk.run(spark, dir))
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"chunking must not aggregate:\n$p")
    // one exchange allowed: the rangepartitioning of the final ORDER BY
    val exchanges = "Exchange \\(".r.findAllIn(p).size
    assert(exchanges <= 1, s"chunking must be shuffle-free before the output sort:\n$p")
  }

  test("ns_text_perplexity: model shuffles keyed on long hashes, not word strings") {
    val p = plan(graft.operators.TextOps.perplexity.run(spark, dir))
    val keys = "hashpartitioning\\(([A-Za-z0-9_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys.nonEmpty, s"expected hash exchanges in the perplexity plan:\n$p")
    // every data-plane exchange rides an 8-byte kernel hash (h1/h2) or
    // the output grouping key — never a word/bigram string
    assert(keys.subsetOf(Set("h1", "h2", "doc_id")),
      s"unexpected shuffle keys ${keys} — strings back in the exchanges?\n$p")
  }

  test("ns_events_interval_join: bin bucketization yields an equi-join — no nested-loop theta join") {
    val p = plan(graft.operators.EventOps.intervalJoin.run(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval overlap must join on the time-bin equi-key, not as a theta join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join on bin:\n$p")
  }

  test("ns_text_quality_pct: thresholds broadcast back; no corpus-wide per-lang window sort") {
    val p = plan(graft.operators.TextOps.qualityPct.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"languages-sized threshold frame should broadcast:\n$p")
    assert(!p.contains("Window ("),
      s"percentile gate must not rank the corpus through a per-lang window:\n$p")
  }

  test("ns_events_retention: cohort sizes broadcast; distinct keys the full cell triple") {
    val p = plan(graft.operators.EventOps.retention.run(spark, dir))
    // the weeks-sized cohort_size frame must broadcast back, never SMJ
    // against the matrix; and nothing plans as a cartesian/theta join
    assert(p.contains("BroadcastHashJoin"), s"cohort sizes should broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"retention must stay on equi-joins:\n$p")
    // the corpus-wide DISTINCT must key on (cohort_week, week_offset,
    // user_id) — a coarser (cohort-only) key would funnel each cohort's
    // events through one reducer, the per-group scale killer
    val distinctKeys = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
      .filter(s => s.contains("cohort_week#") && s.contains("week_offset#"))
    assert(distinctKeys.exists(_.contains("user_id#")),
      s"distinct must include user_id in its shuffle key:\n$p")
  }

  test("ns_events_funnel_steps: one corpus shuffle — both windows and the flag agg share it") {
    val p = plan(graft.operators.EventOps.funnelSteps.run(spark, dir))
    // the design claim is a single user_id hash exchange feeding the
    // window chain AND the per-user flag aggregate; a second corpus
    // exchange means a window or agg stopped riding the shared
    // partitioning (three-joins regression)
    val corpusExchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq.filter(_.contains("user_id#"))
    assert(corpusExchanges.nonEmpty, s"expected the user_id window exchange:\n$p")
    assert(corpusExchanges.toSet.size == 1 && corpusExchanges.size <= 2,
      s"corpus must shuffle on user_id once (shared by windows + agg), got $corpusExchanges\n$p")
    assert(!p.contains("Join"), s"funnel must not plan per-stage joins:\n$p")
  }

  test("ns_vec_gram reference plan: zero-join outer product — corpus never shuffles on vec_id") {
    // the aggregator primary path reduces to one model-sized row (its
    // printed plan is the trivial local reshape), so the zero-join
    // claim is pinned on the distributed explode REFERENCE plan the
    // equivalence spec ties it to
    val q = graft.sources.Tables.embeddings(spark, dir).select(
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000.0 + 0.5d) as bigint))").as("q"))
    val p = plan(graft.operators.VectorsPca.gramCore(q))
    // the self-join formulation reassembles (vec_id, i, q) pairs with a
    // vec_id-keyed shuffle join; the inline expansion must plan neither
    assert(!p.contains("SortMergeJoin"), s"gram must not shuffle-join:\n$p")
    assert(!"hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
      .map(_.group(1)).exists(_.contains("vec_id#")),
      s"no exchange may key on vec_id — pair sums partial-aggregate map-side:\n$p")
  }

  test("ns_text_pmi: vocab via top-V take, pairs inline — corpus never shuffles on doc_id") {
    val p = plan(graft.operators.TextPmi.pmi.run(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-V vocabulary cut must plan TakeOrderedAndProject:\n$p")
    assert(!p.contains("SortMergeJoin"), s"pmi must not shuffle-join:\n$p")
    assert(!"hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
      .map(_.group(1)).exists(_.contains("doc_id#")),
      s"no exchange may key on doc_id — the token self-join regression:\n$p")
  }

  test("ns_events_scd2: one corpus shuffle — both windows and the run agg share user_id") {
    val p = plan(graft.operators.EventOps.scd2.run(spark, dir))
    // lag/run-sum windows, the per-run groupBy (key prefix user_id) and
    // the lead window must all ride ONE user_id hash exchange
    val corpusExchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq.filter(_.contains("user_id#"))
    assert(corpusExchanges.nonEmpty, s"expected the user_id window exchange:\n$p")
    assert(corpusExchanges.toSet.size == 1,
      s"corpus must shuffle on user_id once, got $corpusExchanges\n$p")
    assert(!p.contains("Join"), s"scd2 must not plan joins:\n$p")
  }

  test("ns_events_burstiness: one corpus shuffle + bounded top-N, no global sort") {
    val p = plan(graft.operators.EventStats.burstiness.run(spark, dir))
    val corpusExchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq.filter(_.contains("user_id#"))
    assert(corpusExchanges.nonEmpty, s"expected the user_id window exchange:\n$p")
    assert(corpusExchanges.toSet.size == 1,
      s"lag window and per-user agg must share one user_id exchange, got $corpusExchanges\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N rank must plan TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("ns_text_fuzzy_pairs: candidate generation is a key equi-join, never all-pairs") {
    val p = plan(graft.operators.TextFuzzy.fuzzyPairs.run(spark, dir))
    assert(!p.contains("CartesianProduct"),
      s"fuzzy blocking must not degrade to a cross join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the delete-key join must keep its equi component:\n$p")
  }

  test("ns_dedup_source_overlap: signatures aggregate the raw gram stream with map-side partials") {
    val p = plan(graft.operators.Dedup.sourceOverlapCore(
      graft.operators.Dedup.sourceGrams(spark, dir)))
    assert(p.contains("partial_min"),
      s"signature MINs must partial-aggregate map-side:\n$p")
    // a DISTINCT over grams would add a second hash exchange keyed by
    // the gram column before the signature aggregate
    val gramExchanges = "Exchange hashpartitioning\\(g#".r.findAllIn(p).size
    assert(gramExchanges == 0,
      s"the gram stream must never shuffle on the gram key (MIN needs no dedup):\n$p")
  }

  test("ns_events_gini: rank window partitions by the value bin; offsets broadcast back") {
    val p = plan(graft.operators.EventStats.gini.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"bin offsets and totals must broadcast, not shuffle the user frame:\n$p")
    assert(p.contains("partial_sum"),
      s"per-user cents must partial-aggregate map-side:\n$p")
  }

  test("ns_dag_triangles: orientation and closing joins stay equi — no cartesian wedge product") {
    val p = plan(graft.operators.MetaQueries.trianglesQ.run(spark, dir))
    assert(!p.contains("CartesianProduct"),
      s"triangle enumeration must never cross-join:\n$p")
  }

  test("ns_vec_coreset round: map stage + bounded TakeOrderedAndProject, no Exchange") {
    // each greedy round must be one scan-fused map (least-of-K integer
    // distances) topped by a per-partition top-1 — a shuffle here would
    // pay a corpus-wide exchange PER ROUND at 100 TB
    val q = graft.operators.VectorsCoreset.quantizedFrame(spark, dir)
    val sel = Seq(Seq.fill(64)(0L), Seq.fill(64)(100L)) // two fake selected reps
    val p = plan(graft.operators.VectorsCoreset.roundFrame(q, sel, Seq(0L)))
    assert(p.contains("TakeOrderedAndProject"),
      s"round argmax must plan TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange"),
      s"round must not shuffle — per-partition top-1 then 1-row merge:\n$p")
  }

  test("ns_events_cdc_merge: both latest-per-key windows and the merge share the user_id key — no BNLJ, no cartesian") {
    // the stored-dimension promise: every stage keys on user_id, so a
    // bucketed snapshot never re-shuffles; a nested-loop anywhere here
    // would be a batch × dimension product at 100 TB
    val p = plan(graft.operators.EventCdc.cdcMerge(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"merge must stay an equi-join on user_id:\n$p")
    assert(p.contains("FullOuter"), s"expected the full-outer merge join:\n$p")
  }

  test("ns_text_nb_classify: model and scalars broadcast — the corpus token stream never shuffle-joins on the token") {
    // scoring must be map-side: a corpus-side exchange keyed on the
    // token would re-shuffle 100 TB per scoring run; only the per-doc
    // reduce may exchange
    val p = plan(graft.operators.TextClassify.nbClassify(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"model join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must never sort-merge on the token column:\n$p")
  }

  test("ns_ts_simsearch: JOIN-FREE — literal queries, map-side candidate generation, no corpus self-join") {
    // r14: the NQueries-bounded query side is rendered as integer
    // literals, so candidate generation, the expansion cut, and the
    // exact distance are pure map-side arithmetic on the memoized
    // series scan — ANY join here (broadcast included) means the
    // literal regime regressed; a corpus-side SMJ or cartesian is the
    // all-pairs trap the segment-sum lower bound exists to avoid
    val p = plan(graft.operators.TimeSeries.simSearch(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"series corpus must never self-join:\n$p")
    assert(!p.contains("Join"), s"the literal-query plan is join-free:\n$p")
    assert(p.contains("Window"), s"expected the salted rank windows:\n$p")
  }

  test("ns_corpus_diff: hash-at-scan + one full-outer equi-join on doc_id — no content comparison, no BNLJ") {
    val p = plan(graft.operators.CorpusDiff.snapshotDiff(spark, dir))
    assert(p.contains("FullOuter"), s"expected the full-outer diff join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"diff must stay an equi-join on doc_id:\n$p")
  }

  test("ns_vec_topk_trunc: both stages keep the corpus on broadcast joins — never a corpus-side SMJ") {
    val p = plan(graft.operators.Vectors.truncTopK(spark, dir))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must only broadcast-join the query side:\n$p")
  }

  test("ns_text_chunk_dedup: canonical-copy selection is an aggregate, never a digest-keyed window") {
    // a boilerplate chunk repeated 10^6 times must partial-combine
    // map-side to one row per task — a row_number window over the
    // digest would sort the whale partition instead
    val p = plan(graft.operators.TextOps.chunkDedup.run(spark, dir))
    assert(!p.contains("Window"), s"no window may key on the chunk digest:\n$p")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"canonical selection must be a partial-combining aggregate:\n$p")
  }

  test("ns_text_dsir: scoring is a pure map stage — the model rides a literal map expression, no join at all") {
    // DSIR's design point is the fixed hashed table: the B=256 model
    // collects to the driver and scoring is element_at(map-literal, f)
    // inside the per-doc aggregate — zero joins, zero feature-keyed
    // exchanges over the token stream
    val p = plan(graft.operators.TextSelection.dsir.run(spark, dir))
    assert(!p.contains("Join"), s"scoring stage must carry no join of any kind:\n$p")
    // r8: the rowwise scorer moves ZERO corpus rows — per-doc scores
    // are a pure map (aggregate HOF over the bigram array) feeding
    // TakeOrdered directly, so the scoring plan has no Exchange at all
    // (formatted mode shows each node once in the tree and once in the
    // detail section — count the numbered detail headers)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).isEmpty,
      s"rowwise scoring must not exchange (map -> TakeOrdered only):\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 selection must be bounded, not a full sort:\n$p")
  }

  test("ns_vec_margin_pairs: corpus never windows or SMJs — row-local avg-k(y), bounded aggregators, broadcast winner join") {
    val p = plan(graft.operators.VectorsMining.marginPairs.run(spark, dir))
    assert(!p.contains("windowspecdefinition"),
      s"margins must never rank through a window (Q-partition funnel):\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must never SMJ:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"avg-k(x)/top-1 must ride the bounded aggregator:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"winner set must broadcast:\n$p")
  }

  test("ns_vec_pca_project: projection is a map with the axis as a literal — no join, one label-keyed exchange") {
    // the eigensolve happens at plan-construction time (driver-side
    // integer math over the collected d×d gram — model-sized); the
    // RETURNED plan must be scan → HOF-dot projection → partial-agg'd
    // label aggregate, nothing else
    val p = plan(graft.operators.VectorsPca.pcaProject.run(spark, dir))
    assert(!p.contains("Join"), s"projection must not join:\n$p")
    assert(!p.contains("windowspecdefinition"), s"projection must not window:\n$p")
    // exchange #1: label-keyed partial aggregate; exchange #2: range
    // partitioning for the final ORDER BY over the label-sized result
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 2,
      s"only the label agg + final order may exchange:\n$p")
    assert(p.contains("partial_sum"), s"label sums must partial-aggregate map-side:\n$p")
  }

  test("ns_vec_decontam_semantic: eval set broadcasts; argmax is a partial-aggregated max-of-struct, not a window") {
    // the corpus side must stream once: broadcast-probe the (small)
    // eval set, reduce map-side to one row per (task, eval_id); a
    // digest/eval-keyed window would sort the full train x eval
    // inflation in the reducers
    val p = plan(graft.operators.VectorsMining.semanticDecontam.run(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"eval probe side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"train side must never SMJ/cartesian:\n$p")
    assert(!p.contains("Window"), s"argmax must be an aggregate, not a window:\n$p")
    assert(p.contains("partial_max") || p.contains("HashAggregate"),
      s"expected partial aggregation:\n$p")
  }

  test("whole-stage codegen covers the k19 aggregate") {
    // AQE's pre-execution FormattedMode hides WSCG wrappers; CodegenMode
    // shows the generated subtrees
    val p = Analytics.pricingSummary.run(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen"), s"expected WSCG spans:\n$p")
  }

  test("ns_mm_phash_dups / ns_mm_audio_dups: candidates come from the band equi-join — never an all-pairs term") {
    // the LSH band join must stay a (band_idx, band_val)-keyed equi-join
    // at every size: a cartesian/BNLJ here is the O(n²) pair explosion
    // the banding exists to avoid (both corpus sides are big at 100 TB,
    // so a broadcast would also be wrong — but AQE may legally pick one
    // at toy SF; only the nested-loop shapes are banned).
    for (q <- Seq(graft.operators.Multimodal.phashDups,
                  graft.operators.Multimodal.audioDups)) {
      val p = plan(q.run(spark, dir))
      assert(!p.contains("CartesianProduct"), s"${q.name}: cartesian pair term:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"${q.name}: BNLJ pair term:\n$p")
      assert(p.contains("band_idx") && p.contains("band_val"),
        s"${q.name}: join should key on the band columns:\n$p")
    }
  }

  test("ns_mm_video_dups: shingle equi-join on the 4-long hash tuple — never an all-pairs term") {
    val p = plan(graft.operators.Multimodal.videoDups.run(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian pair term:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ pair term:\n$p")
    assert(p.contains("h1_hi") && p.contains("h2_lo"),
      s"join should key on the shingle hash columns:\n$p")
  }

  test("ns_vec_incremental_ivf: batch side broadcasts; index is scanned once, never self-joined") {
    val p = plan(graft.operators.VectorsIvf.ivfIncremental(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected the ingest batch broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop term in the ingest path:\n$p")
  }

  test("ns_mm_crossmodal_gate: 1:1 id-keyed bridge, gate algebra is a map — no window, no nested loop") {
    val p = plan(graft.operators.Multimodal.crossmodalGate.run(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop term:\n$p")
    assert(!p.contains(" Window"), s"gate must not window the corpus:\n$p")
  }

  test("ns_mm_multimodal_funnel: verdict stages bridge on id-keyed joins — no window, no nested loop") {
    val p = plan(graft.operators.Multimodal.multimodalFunnel.run(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop term:\n$p")
    assert(!p.contains(" Window"), s"funnel must not window the corpus:\n$p")
  }

  test("ns_mm_multimodal_funnel: ONE documents scan — lang and text_keep ride the same read (r10 wrong #3)") {
    // leaves of the EXECUTED plan: memoized frames (dupMedia, the CC
    // labels) appear as InMemoryTableScan leaves, so every remaining
    // FileSourceScan is a real per-run table read — documents must
    // contribute exactly one (the pre-filtered (doc_id, lang,
    // text_keep) projection), not one per verdict stage
    val df = graft.operators.Multimodal.multimodalFunnel.run(spark, dir)
    def docScans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        docScans(a.inputPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        if (s.relation.location.rootPaths.exists(_.toString.contains("documents"))) 1 else 0
      case other => other.children.map(docScans).sum
    }
    val n = docScans(df.queryExecution.executedPlan)
    assert(n == 1, s"expected exactly 1 documents file scan, got $n:\n${plan(df)}")
  }

  test("ns_parts_profit: nation broadcasts; no cartesian anywhere in the 4-way join tree") {
    val p = plan(graft.operators.AnalyticsParts.partsProfit.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected the nation dim broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the star join:\n$p")
  }

  test("ns_parts_small_qty: p_size predicate pushes to the part scan") {
    val p = plan(graft.operators.AnalyticsParts.partsSmallQty.run(spark, dir))
    assert(p.contains("LessThanOrEqual(p_size,25)"),
      s"p_size cut must reach the parquet scan as a pushed filter:\n$p")
  }

  test("ns_orders_large: bounded top-100 plans TakeOrderedAndProject, no full sort") {
    val p = plan(graft.operators.AnalyticsParts.ordersLarge.run(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("ns_parts_named: the name LIKE cut pushes to the part scan") {
    val p = plan(graft.operators.AnalyticsParts.partsNamed.run(spark, dir))
    assert(p.contains("StringContains(p_name,red)"),
      s"p_name LIKE must reach the parquet scan:\n$p")
  }

  test("ns_supplier_rank: dimension window plans WindowGroupLimit") {
    val p = plan(graft.operators.AnalyticsParts.supplierRank.run(spark, dir))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }

  test("ns_vec_planted_dups: pruned embeddings scan, band equi-join, no all-pairs term") {
    val p = plan(graft.operators.VectorsPlanted.plantedDups.run(spark, dir))
    // the generator reads only (vec_id, embedding) — label never loads
    assert(!p.contains("label"), s"embeddings scan must prune label:\n$p")
    // candidates come from the (band_idx, band_val) equi-join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"planted dup detection must never plan an all-pairs term:\n$p")
  }

  test("ns_vec_incremental_dups: asymmetric new x index probe — memo-backed sides, no cartesian") {
    val df = graft.operators.VectorsPlanted.plantedIncremental.run(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ingest probe must never plan an all-pairs term:\n$p")
    // both the signature index and the vector verify sides ride the
    // OpMemo'd planted frames — cached rows, not fresh generator runs
    assert(p.contains("InMemoryTableScan"),
      s"expected the memoized planted frames under the probe:\n$p")
  }
}
