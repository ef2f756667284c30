package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{ScaleOps, Vectors, VectorsIvf}
import graft.streaming.WindowedAgg
import graft.sources.Tables

/** Scale utilities, IVF ANN, and the streaming windowed aggregation. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._
  private val dir = SparkSuite.sfDir

  test("saltedSum equals plain groupBy sum") {
    val li = Tables.lineitem(spark, dir)
    val plain = li.groupBy("l_returnflag").agg(
      sum("l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2)))).toMap
    val salted = ScaleOps.saltedSum(li, "l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("dynamic partition pruning: a dimension-side filter prunes the partitioned fact scan at runtime") {
    // the 100 TB lever static pruning can't reach: the fact table is
    // partitioned by day, the filter lives on a DIMENSION attribute,
    // and only the broadcast join result knows which days survive —
    // DPP injects that set into the fact scan's PartitionFilters so
    // untouched day-partitions are never read
    val tmp = SparkSuite.tempDir("graft-dpp")
    Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val days = fact.select("day").distinct()
      .withColumn("is_audit_day", dayofmonth(col("day")) <= 2)
    val joined = fact.join(days.where(col("is_audit_day")), "day")
      .groupBy("day").agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n${p.take(4000)}")
    // and the pruned result is correct: only days 1-2 survive
    val got = joined.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val expected = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .where(dayofmonth(col("day")) <= 2)
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("saltedJoin equals plain join") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = ScaleOps.saltedJoin(li, o, "l_orderkey").count()
    assert(salted == plain)
  }

  test("bucketed join on the bucket key plans without exchange on bucketed sides") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    ScaleOps.writeBucketed(li, "li_b", "l_orderkey", 8)
    ScaleOps.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", 8)
    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    // disable broadcast so the co-located (bucketed) join shape is observable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(joined.count() > 0)
  }

  test("IVF index AT REST: the bucketed-by-cell parquet form serves the ingest probe identically") {
    // VectorsIvf.ivfIndex documents its 100 TB form as a
    // bucketed-by-cell parquet sink; this proves the prose — the
    // OpMemo frame written through ScaleOps.writeBucketed and probed
    // from the metastore yields the exact candidate set of the
    // memoized path, and the index side of the probe join reads the
    // bucketed layout with no exchange of its own (batch broadcasts).
    val isNew = expr("vec_id % 10 = 7")
    val cents = VectorsIvf.centroids(spark, dir)
    ScaleOps.writeBucketed(
      VectorsIvf.ivfIndex(spark, dir).where(!isNew), "ivf_index_rest", "cell", 8)
    val probes = VectorsIvf.ivfIndex(spark, dir).where(isNew)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(VectorsIvf.probeCells(col("embedding"), cents, VectorsIvf.NumProbes)).as("cell"))
    def pairs(index: org.apache.spark.sql.DataFrame) =
      index.join(broadcast(probes), Seq("cell"))
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaRest = pairs(spark.table("ivf_index_rest"))
    val viaMemo = pairs(VectorsIvf.ivfIndex(spark, dir).where(!isNew))
    assert(viaRest.nonEmpty && viaRest == viaMemo,
      s"stored-index probe diverged: ${viaRest.size} vs ${viaMemo.size} candidates")
    // layout really is bucketed (metastore-tracked)
    val desc = spark.sql("DESCRIBE EXTENDED ivf_index_rest").collect().map(_.mkString(" "))
    assert(desc.exists(_.contains("Num Buckets")), s"expected bucket spec:\n${desc.mkString("\n")}")
  }

  test("writeCurated: hive partition dirs, in-file sort order, partition pruning on read") {
    val out = SparkSuite.tempDir("curated")
    val docs = Tables.documents(spark, dir)
    ScaleOps.writeCurated(docs, out, partCol = "lang", sortCol = "doc_id")
    // layout: one lang=<v> dir per language, nothing at the root
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == langs.map(l => s"lang=$l"), s"expected hive dirs for $langs, got $dirs")
    // round trip: same rows (partition column survives as a read column)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").except(docs.select("doc_id")).isEmpty)
    // in-file ordering: doc_id must arrive sorted WITHIN each file —
    // the zone-map contract (each file's min/max ranges are tight); a
    // read split may concatenate several files, so order resets at
    // file boundaries
    val unsorted = back.select(input_file_name().as("f"), col("doc_id"))
      .mapPartitions { it =>
        var prevFile = ""; var prev = Long.MinValue; var bad = 0L
        it.foreach { r =>
          val (f, v) = (r.getString(0), r.getLong(1))
          if (f != prevFile) { prevFile = f; prev = Long.MinValue }
          if (v < prev) bad += 1
          prev = v
        }
        Iterator.single(bad)
      }.collect().sum
    assert(unsorted == 0, s"$unsorted rows out of doc_id order within files")
    // partition pruning: a lang filter must reach the scan as a
    // partition filter, not a post-scan predicate
    val one = langs.head
    val p = back.where(col("lang") === one)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains(s"lang#"),
      s"lang filter must prune partitions:\n$p")
  }

  test("writeCuratedAtomic: crash-replay leaves the prior snapshot readable; retry is idempotent") {
    val out = SparkSuite.tempDir("curated-atomic")
    val docs = Tables.documents(spark, dir)
    val v1 = docs.where(col("doc_id") % 2 === 0)
    val v2 = docs.where(col("doc_id") % 2 === 1)
    // commit 1
    assert(ScaleOps.writeCuratedAtomic(v1, out, "lang", "doc_id") == "snap-1")
    assert(ScaleOps.currentSnapshot(spark, out).contains("snap-1"))
    assert(ScaleOps.readCurated(spark, out).count() == v1.count())
    // CRASH mid-write-2: the data dir for snap-2 exists (partial junk),
    // the manifest was never renamed — readers must still see snap-1
    val partial = new java.io.File(s"$out/snap-2/lang=en"); partial.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/snap-2/lang=en/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(ScaleOps.currentSnapshot(spark, out).contains("snap-1"),
      "an uncommitted write must not change the manifest")
    assert(ScaleOps.readCurated(spark, out).count() == v1.count(),
      "readers must keep serving the committed snapshot after a crash")
    // RETRY: targets the same snap-2 in overwrite mode (clobbers the
    // partial attempt), then publishes atomically
    assert(ScaleOps.writeCuratedAtomic(v2, out, "lang", "doc_id") == "snap-2")
    assert(ScaleOps.readCurated(spark, out).count() == v2.count())
    assert(ScaleOps.readCurated(spark, out)
      .select("doc_id").except(v2.select("doc_id")).isEmpty)
    // retention: committed + immediately prior are kept, nothing older
    assert(ScaleOps.writeCuratedAtomic(v1, out, "lang", "doc_id") == "snap-3")
    val snaps = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snap-")).map(_.getName).toSet
    assert(snaps == Set("snap-2", "snap-3"), s"retention kept $snaps")
    // the manifest is the only way in: the undo snapshot is intact
    assert(spark.read.parquet(s"$out/snap-2").count() == v2.count())
  }

  test("IVF topk: recall@5 vs brute force is reasonable, probes bound candidates") {
    val bf = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorsIvf.ivfTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall > 0.3, s"IVF recall too low: $recall") // 4/16 cells probed on uniform data
    // probing all cells must recover brute force exactly
    val full = VectorsIvf.ivfTopK(spark, dir, nProbe = VectorsIvf.NumCells)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf)
  }

  test("native int8 quantizer == HOF quantizer, bit for bit") {
    val emb = Tables.embeddings(spark, dir).limit(200)
    val diff = emb.select(
      Vectors.quantizeInt8(col("embedding")).as("native"),
      Vectors.quantizeInt8Ref(col("embedding")).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("int8-quantized topk: high recall vs brute force") {
    val bf = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qz = Vectors.quantizedTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect qz).size.toDouble / bf.size
    assert(recall >= 0.8, s"int8 refine-and-rerank recall too low: $recall")
  }

  test("connectedComponents: chain, triangle and pair resolve to min-label clusters") {
    // components: chain 1-2-3-4-5, triangle 10-11-12 (with a redundant
    // edge), isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents refuses to emit partially-propagated labels (ADVICE r3)") {
    // chain of diameter 9 with maxIters=3: min-label propagation cannot
    // finish — must throw, never return wrong clusters silently
    val chain = (1L to 9L).map(i => (i, i + 1L)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      graft.operators.Dedup.connectedComponents(chain, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and the same graph converges fine when maxIters covers the diameter
    val ok = graft.operators.Dedup.connectedComponents(chain, maxIters = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ok == (1L to 10L).map(_ -> 1L).toMap)
  }

  test("TopKAggregator top-k == window-ranking top-k") {
    val win = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val agg = Vectors.aggregatorTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(agg == win)
  }

  test("RP projection via native dot == HOF zip_with/aggregate, bit for bit") {
    val emb = Tables.embeddings(spark, dir).limit(200)
    val hofProj = org.apache.spark.sql.functions.array(
      graft.operators.Vectors.rpMatrix.map(row =>
        graft.operators.Vectors.dotHof(col("embedding"),
          org.apache.spark.sql.functions.typedLit(row.toSeq))): _*)
    val diff = emb.select(
      graft.operators.Vectors.rpProject(col("embedding")).as("native"),
      hofProj.as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("RP prefilter + exact re-rank: recall floor vs brute force (isotropic worst case)") {
    // the synthetic embeddings are near-isotropic — the adversarial
    // regime for ANY locality structure (LSH and IVF pin >0.3 here
    // too); on clustered real embeddings the JL estimator separates
    // far better. The floor documents measured behavior (0.52 at
    // sf0.01) with slack for other SFs, and the oracle independently
    // pins algorithm fidelity bit-for-bit.
    val bf = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rp = Vectors.rpTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect rp).size.toDouble / bf.size
    assert(recall >= 0.3, s"RP refine-and-rerank recall too low: $recall")
  }

  test("native LSH buckets == column-algebra buckets, bit for bit") {
    val emb = Tables.embeddings(spark, dir).limit(200)
    val diff = emb.select(
      Vectors.lshBuckets(col("embedding")).as("native"),
      Vectors.lshBucketsRef(col("embedding")).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("k01 footer-metadata counts == v2 pushed-scan counts == direct counts") {
    val expected = Tables.names.map(n => n -> Tables(spark, dir, n).count()).toMap
    val footer = graft.operators.Analytics.tableCounts.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(footer == expected)
    val scan = graft.operators.Analytics.tableCountsViaScan(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(scan == expected)
    // the conf flip must not leak
    assert(spark.conf.get("spark.sql.sources.useV1SourceList").contains("parquet"))
  }

  test("native one-pass MinHash signatures == explode+aggregate signatures, bit for bit") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.hashedShingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val native = Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val agg = Dedup.minhashSignaturesAgg(docs)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(i => r.getLong(i)).toVector).toMap
    assert(native == agg)
  }

  test("native one-pass SimHash signatures == explode+aggregate signatures, bit for bit") {
    import graft.operators.Dedup
    val native = Dedup.simhashSignatures(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val agg = Dedup.simhashSignaturesAgg(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native == agg)
  }

  test("zorderKey: interleave matches hand-computed keys and de-interleaves back") {
    import spark.implicits._
    import graft.operators.ScaleOps
    val pairs = Seq((5L, 0L), (0L, 5L), (3L, 3L), (123456L, 654L), (0L, 0L))
    val rows = pairs.toDF("a", "b")
      .withColumn("z", ScaleOps.zorderKey(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPair = rows.map(r => (r._1, r._2) -> r._3).toMap
    // a occupies even bit positions, b odd: 101 ⊕ 000 = 010001₂ = 17
    assert(byPair((5L, 0L)) == 17L)
    assert(byPair((0L, 5L)) == 34L)
    assert(byPair((3L, 3L)) == 15L)
    assert(byPair((0L, 0L)) == 0L)
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      for (i <- 0 until 20) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    rows.foreach { case (a, b, z) =>
      assert(deinterleave(z) == (a, b), s"z=$z must reconstruct ($a,$b)")
    }
  }

  test("streaming windowed agg with watermark == batch daily totals") {
    val batch = graft.operators.Analytics.eventsDaily.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3))).toSet

    val srcDir = SparkSuite.tempDir("wagg-src")
    val ckpt = SparkSuite.tempDir("wagg-ckpt")
    val ev = Tables.events(spark, dir).select("ts", "event_type", "value")
    ev.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
    val q = WindowedAgg.dailyTotals(stream)
      .writeStream.format("memory").queryName("wagg_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000),
      "streaming query did not finish in 120s")
    q.stop()
    // append mode emits only windows closed by the watermark; the last
    // event day stays open, so compare on the emitted subset and check
    // everything emitted matches batch exactly.
    val streamed = spark.table("wagg_out")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streaming rows not found in batch: ${streamed -- batch}")
  }

  test("MisraGries: exact when vocabulary fits; MG guarantees when it does not") {
    import graft.functions.{FreqSketch, MisraGriesAggregator}
    // zipf-ish synthetic stream: token t_i appears (100 - i) times
    val docs: Seq[Seq[String]] = (0 until 100).map(i => Seq.fill(100 - i)(f"t$i%03d")).toSeq
    val truth: Map[String, Long] =
      docs.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val n = truth.values.sum
    def runWith(capacity: Int): FreqSketch = {
      val agg = new MisraGriesAggregator(capacity)
      // fold in a few different groupings to exercise merge() paths,
      // then the final finish() contraction (as Spark's agg path does)
      agg.finish(docs.grouped(7).map(g => g.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge))
    }
    // capacity >= vocab: exact, zero decrements
    val exact = runWith(128)
    assert(exact.decrements == 0 && exact.counts == truth)
    // capacity < vocab: (a) estimates never exceed truth, (b) truth never
    // exceeds estimate + decrements, (c) decrements <= N/(capacity+1),
    // (d) every heavy hitter above the decrement bound is present
    val sk = runWith(20)
    assert(sk.decrements > 0 && sk.counts.size <= 20)
    sk.counts.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t over-estimated")
      assert(truth(t) <= est + sk.decrements, s"$t beyond error bound")
    }
    assert(sk.decrements <= n / 21, s"decrements ${sk.decrements} above N/(m+1)")
    truth.collect { case (t, c) if c > sk.decrements => t }
      .foreach(t => assert(sk.counts.contains(t), s"heavy hitter $t evicted"))
  }

  test("MisraGries property: bounds hold for arbitrary streams, groupings and capacities") {
    import org.scalacheck.{Gen, rng}
    import graft.functions.MisraGriesAggregator
    val docGen = Gen.listOf(Gen.chooseNum(0, 60).map(i => f"w$i%02d"))
    val streamGen = for {
      docs <- Gen.listOfN(40, docGen)
      capacity <- Gen.chooseNum(1, 30)
      chunk <- Gen.chooseNum(1, 10)
    } yield (docs.map(_.toSeq), capacity, chunk)
    (0 until 150).foreach { seed =>
      streamGen.apply(Gen.Parameters.default, rng.Seed(seed.toLong)).foreach {
        case (docs, capacity, chunk) =>
          val agg = new MisraGriesAggregator(capacity)
          val sk = agg.finish(
            docs.grouped(chunk).map(g => g.foldLeft(agg.zero)(agg.reduce))
              .foldLeft(agg.zero)(agg.merge))
          val truth = docs.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
          val n = truth.values.sum
          assert(sk.counts.size <= capacity)
          sk.counts.foreach { case (t, est) =>
            assert(est <= truth(t), s"seed=$seed over-estimate on $t")
            assert(truth(t) <= est + sk.decrements, s"seed=$seed error bound broken on $t")
          }
          assert(sk.decrements <= n / (capacity + 1), s"seed=$seed decrement bound broken")
          truth.collect { case (t, c) if c > sk.decrements => t }
            .foreach(t => assert(sk.counts.contains(t), s"seed=$seed heavy hitter $t evicted"))
      }
    }
  }

  test("positional shingle kernel property: length law, per-position recompute, distinct+sort link") {
    import org.scalacheck.{Gen, rng}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TokenHashing
    val textGen = for {
      n <- Gen.chooseNum(0, 40)
      toks <- Gen.listOfN(n, Gen.chooseNum(0, 25).map(i => s"t$i"))
      sep <- Gen.oneOf(" ", "  ", " \t", "\n")
    } yield (toks, toks.mkString(sep))
    for (w <- Seq(1, 2, 3, 8); seed <- 0 until 100) {
      textGen.apply(Gen.Parameters.default, rng.Seed(seed.toLong + w * 1000)).foreach {
        case (toks, text) =>
          val u = UTF8String.fromString(text)
          val pos = TokenHashing.positionalShingleHashes(u, w)
          assert(pos.length == math.max(0, toks.length - w + 1),
            s"w=$w seed=$seed: length law broken for ${toks.length} tokens")
          // each position recomputed independently from its own w-token
          // sub-text must yield the same hash (prefix-freedom of the combine)
          pos.zipWithIndex.foreach { case (h, i) =>
            val sub = UTF8String.fromString(toks.slice(i, i + w).mkString(" "))
            assert(TokenHashing.positionalShingleHashes(sub, w).head == h,
              s"w=$w seed=$seed pos=$i: positional hash not position-local")
          }
          // the distinct+sorted kernel is exactly a view of the positional one
          assert(TokenHashing.shingleHashes(u, w).toSeq == pos.distinct.sorted.toSeq,
            s"w=$w seed=$seed: shingleHashes != positional.distinct.sorted")
      }
    }
  }

  test("heavy hitters query equals the naive explode+groupBy plan") {
    val naive = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = graft.operators.TextOps.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch == naive)
  }

  test("gram aggregator == explode reference plan, bit for bit") {
    import graft.operators.VectorsPca
    val q = Tables.embeddings(spark, dir).select(
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000.0 + 0.5d) as bigint))")
        .as("q"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))
    val viaAgg = VectorsPca.gramAggCore(spark, q, 64).collect().map(key).toMap
    val viaExplode = VectorsPca.gramCore(q).collect().map(key).toMap
    assert(viaAgg == viaExplode, "aggregator and explode gram plans must be bit-identical")
  }

  test("native float-double dot == interpreted HOF dot, bit for bit") {
    import graft.operators.VectorsKmeans
    val cents = VectorsKmeans.train(spark, dir)
    val c0 = cents.head._2
    val cmp = Tables.embeddings(spark, dir)
      .select(
        graft.functions.VectorExpressions.vecDotFD(col("embedding"),
          array(c0.map(lit): _*)).as("native"),
        VectorsKmeans.dotLitRef(col("embedding"), c0).as("hof"))
      .where(col("native") =!= col("hof"))
    assert(cmp.isEmpty, "native and HOF float-double dots diverged")
  }

  test("kmeans: objective descends monotonically over Lloyd iterations") {
    import graft.operators.VectorsKmeans
    val c0 = VectorsKmeans.initialCentroids(spark, dir)
    val c1 = VectorsKmeans.refined(spark, dir, c0)
    val c2 = VectorsKmeans.refined(spark, dir, c1)
    val o0 = VectorsKmeans.objective(spark, dir, c0)
    val o1 = VectorsKmeans.objective(spark, dir, c1)
    val o2 = VectorsKmeans.objective(spark, dir, c2)
    assert(o1 <= o0 + 1e-9, s"first Lloyd step increased objective: $o0 -> $o1")
    assert(o2 <= o1 + 1e-9, s"second Lloyd step increased objective: $o1 -> $o2")
    // the quantized mean moves centroids off the seed = real refinement
    assert(o1 < o0, "refinement did not move the objective at all")
    // every vector keeps a cluster; cluster count stays <= K
    assert(c2.size <= VectorsKmeans.K && c2.nonEmpty)
  }

  test("simhash emit-once == dropDuplicates reference, and truly emits once") {
    import graft.operators.Dedup
    val emitted = Dedup.simhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // no pair twice (the first-collision filter's whole point)
    assert(emitted.map(p => (p._1, p._2)).distinct.length == emitted.length)
    // equals the dropDuplicates formulation it replaced
    val sigs = Dedup.simhashSignatures(spark, dir)
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFF)): _*))
        .as(Seq("band_idx", "band_val")))
    val a = bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val ref = a.join(b, Seq("band_idx", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= 3)
      .dropDuplicates("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(emitted.toSet == ref.toSet)
  }

  test("IVF over trained k-means centroids: sane recall, full probe recovers brute force") {
    import graft.operators.VectorsKmeans
    val bf = Vectors.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorsKmeans.ivfKmeansTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall > 0.3, s"IVF-kmeans recall too low: $recall")
    val full = VectorsKmeans.ivfKmeansTopK(spark, dir, nProbe = VectorsKmeans.K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf, "probing every trained cell must recover brute force exactly")
  }

  test("streaming MG heavy hitters (complete mode) == batch sketch") {
    import graft.functions.MisraGriesAggregator
    val srcDir = SparkSuite.tempDir("mg-src")
    Tables.documents(spark, dir).select(split(col("text"), " ").as("toks"))
      .write.mode("overwrite").parquet(srcDir)
    val batch = graft.operators.TextOps.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val agg = new MisraGriesAggregator(4096).toColumn
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("toks",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))))
      .parquet(srcDir)
      .as[Seq[String]]
      .groupByKey(_ => 0)
      .agg(agg.name("sk"))
    val q = stream.toDF("k", "sk")
      .writeStream.format("memory").queryName("mg_out").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000),
      "streaming query did not finish in 120s")
    q.stop()
    val sk = spark.table("mg_out").select(col("sk.counts")).head().getMap[String, Long](0)
    val streamed = sk.toSeq.sortBy { case (t, n) => (-n, t) }.take(20).toSet
    assert(streamed == batch,
      "the mergeable sketch must produce identical heavy hitters in streaming")
  }

  test("label outliers: descending distances, each beyond its label's median distance") {
    import graft.operators.VectorsKmeans
    val out = VectorsKmeans.labelOutliers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 20)
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last), "distances must descend")
    // an emitted outlier is genuinely atypical: farther from its label
    // centroid than that label's median member (full-set recompute)
    val all = VectorsKmeans.labelOutliers(spark, dir, topN = Int.MaxValue)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val medians = all.groupBy(_._1).map { case (l, xs) =>
      val s = xs.map(_._2).sorted; l -> s(s.length / 2)
    }
    out.foreach { case (id, l, d) =>
      assert(d >= medians(l), s"vec $id emitted as outlier but below label-$l median")
    }
  }

  test("HLL approx vocabulary (registered ns_text_vocab_approx) within 5% of exact, totals exact") {
    val exact = graft.operators.TextOps.vocab.run(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.operators.TextOps.vocabApprox.run(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, (ev, et)) =>
      val rel = math.abs(approx(lang)._1 - ev).toDouble / ev
      assert(rel < 0.05, s"HLL for $lang off by ${rel * 100}%: ${approx(lang)._1} vs $ev")
      assert(approx(lang)._2 == et, s"$lang: plain COUNT must stay exact")
    }
  }

  test("bloom-prefiltered decontamination is byte-identical to the exact plan") {
    import graft.operators.Dedup
    val exact = Dedup.ngramDecontam(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val bloom = Dedup.ngramDecontamBloom(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(exact.nonEmpty, "decontamination fixture produced no contaminated probes")
    assert(bloom == exact)
  }
}
