package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventCdc, TextClassify}

/** CDC-merge corner semantics the value-hash oracle can't isolate
  * (tombstone delete, delete-of-absent no-op, latest-wins tiebreak),
  * plus the NB classifier's score decomposition. */
class EventCdcSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sfDir

  import org.apache.spark.sql.functions._

  private def mkEvents(rows: Seq[(Long, Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ts_s", "cents")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"), col("cents"))
  }

  test("cdc merge corners: update, keep, insert, tombstone delete, delete-of-absent no-op, latest-wins tie") {
    val cutoff = "2024-01-16 00:00:00"
    val ev = mkEvents(Seq(
      // u1: in snapshot, updated by batch (latest of two changes wins)
      (1L, 10L, "view", "2024-01-02 00:00:00", 100L),
      (1L, 11L, "click", "2024-01-20 00:00:00", 200L),
      (1L, 12L, "purchase", "2024-01-21 00:00:00", 300L),
      // u2: snapshot only -> keep
      (2L, 20L, "signup", "2024-01-03 00:00:00", 50L),
      // u3: batch only -> insert
      (3L, 30L, "view", "2024-01-18 00:00:00", 70L),
      // u4: in snapshot, latest change is a tombstone -> deleted
      (4L, 40L, "purchase", "2024-01-05 00:00:00", 900L),
      (4L, 41L, "error", "2024-01-25 00:00:00", 0L),
      // u5: not in snapshot, tombstone only -> no-op (must NOT insert)
      (5L, 50L, "error", "2024-01-26 00:00:00", 0L),
      // u6: same-ts tie in the batch -> higher event_id wins
      (6L, 60L, "view", "2024-01-04 00:00:00", 10L),
      (6L, 61L, "click", "2024-01-22 00:00:00", 20L),
      (6L, 62L, "purchase", "2024-01-22 00:00:00", 30L)))
    val out = EventCdc.cdcMergeCore(ev, cutoff)
      .select("user_id", "state", "cents", "action").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == (("purchase", 300L, "update")))
    assert(out(2L) == (("signup", 50L, "keep")))
    assert(out(3L) == (("view", 70L, "insert")))
    assert(!out.contains(4L), "tombstone must delete u4")
    assert(!out.contains(5L), "tombstone on absent key must not insert u5")
    assert(out(6L) == (("purchase", 30L, "update")), "same-ts tie must resolve by event_id")
    assert(out.size == 4)
  }

  test("cdc merge partitions keys: merged keyset == (snapshot ∪ batch) minus tombstoned") {
    val merged = EventCdc.cdcMerge(spark, dir)
    val n = merged.count()
    val actions = merged.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet.subsetOf(Set("keep", "insert", "update")))
    assert(actions.values.sum == n)
    // every user_id appears exactly once (it's a dimension)
    assert(merged.select("user_id").distinct().count() == n)
  }

  test("cdc merge property: equals an independent in-memory fold on random event streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cutoffUs = java.sql.Timestamp.valueOf("2024-01-16 00:00:00").getTime * 1000L
    val evGen = Gen.listOf(for {
      user <- Gen.choose(1L, 8L)           // few users -> dense per-key histories
      day <- Gen.choose(1, 30)             // straddles the cutoff
      sec <- Gen.choose(0, 3)              // deliberate ts collisions
      typ <- Gen.oneOf("view", "click", "purchase", "signup", "error")
      cents <- Gen.choose(0L, 999L)
    } yield (user, f"2024-01-$day%02d 00:00:0$sec", typ, cents))
    (0 until 40).foreach { i =>
      evGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { rows =>
        val evs = rows.zipWithIndex.map { case ((u, t, ty, c), id) =>
          (u, id.toLong, ty, t, c)
        }
        // reference: plain Scala fold — latest (ts, event_id) per key
        // per side, then merge with tombstone semantics
        def latest(side: Seq[(Long, Long, String, String, Long)]) =
          side.groupBy(_._1).view.mapValues(_.maxBy(e =>
            (java.sql.Timestamp.valueOf(e._4).getTime, e._2))).toMap
        val usOf = (t: String) => java.sql.Timestamp.valueOf(t).getTime * 1000L
        val snap = latest(evs.filter(e => usOf(e._4) < cutoffUs))
        val chg = latest(evs.filter(e => usOf(e._4) >= cutoffUs))
        val expected = (snap.keySet ++ chg.keySet).flatMap { u =>
          (snap.get(u), chg.get(u)) match {
            case (_, Some(c)) if c._3 == "error" => None
            case (Some(_), Some(c)) => Some((u, c._3, c._5, "update"))
            case (None, Some(c)) => Some((u, c._3, c._5, "insert"))
            case (Some(s), None) => Some((u, s._3, s._5, "keep"))
            case (None, None) => None
          }
        }
        val got = EventCdc.cdcMergeCore(mkEvents(evs), "2024-01-16 00:00:00")
          .select("user_id", "state", "cents", "action").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
        assert(got == expected, s"seed $i: +${got diff expected} -${expected diff got}")
      }
    }
  }

  test("nb classifier: score decomposes as prior + sum of per-token quantized weights") {
    val out = TextClassify.nbClassify(spark, dir)
    // recompute the model independently (collected — test-scale only)
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
    val train = toks.where(col("doc_id") % 5 =!= 0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val eval = toks.where(col("doc_id") % 5 === 0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cPos = train.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cNeg = train.filter(_._2 != "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val vocab = (cPos.keySet ++ cNeg.keySet)
    val nPos = cPos.values.sum; val nNeg = cNeg.values.sum; val v = vocab.size.toLong
    val dPos = train.filter(_._2 == "en").map(_._1).distinct.length.toLong
    val dNeg = train.filter(_._2 != "en").map(_._1).distinct.length.toLong
    def micro(a: Long, b: Long, c: Long, d: Long): Long =
      math.floor((math.log(a.toDouble) - math.log(b.toDouble)
        - math.log(c.toDouble) + math.log(d.toDouble)) * 1000000.0).toLong
    val prior = math.floor((math.log(dPos.toDouble) - math.log(dNeg.toDouble)) * 1000000.0).toLong
    val expected = eval.groupBy(_._1).view.mapValues { rows =>
      prior + rows.map { case (_, _, w) =>
        micro(cPos.getOrElse(w, 0L) + 1, nPos + v, cNeg.getOrElse(w, 0L) + 1, nNeg + v)
      }.sum
    }.toMap
    val got = out.select("doc_id", "score_micro", "pred_en").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (score, pred)) =>
      assert(score == expected(id), s"doc $id score mismatch")
      assert(pred == (score > 0))
    }
  }

  test("nb classifier: out-of-vocabulary tokens score with the shared OOV weight (no nulls, no drops)") {
    val out = TextClassify.nbClassify(spark, dir)
    // n_toks must equal the eval split's raw token count — a null
    // weight dropped by sum() would undercount silently
    val evalToks = graft.sources.Tables.documents(spark, dir)
      .where(col("doc_id") % 5 === 0)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val scored = out.agg(sum("n_toks")).collect()(0).getLong(0)
    assert(scored == evalToks, "every eval token must contribute a weight")
  }
}
