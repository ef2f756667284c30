package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.orchestration.StateMachine
import graft.orchestration.StateMachine._

/** Pure-core tests for the incubation state machine (SURVEY §5.4/§5.5:
  * trigger-rule algebra, oldest-first selection, culler rules).
  * Property tests sample scalacheck generators directly (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class StateMachineSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def ts(s: String) = graft.meta.Fixtures.ts(s)
  private val now = ts("2024-02-01 00:00:00")
  private val meta2 = Meta(Some("all"), Seq("dep-a", "dep-b"), 0, concurrency = false)

  private def sat(dep: String, id: Long, t: String = "2024-01-31 23:00:00") =
    DepSatisfied(dep, s"exec-$id", id, ts(t))

  test("dep satisfaction creates a waiting row with all deps, then satisfies one") {
    val st = applyDepSatisfied(emptyState, meta2, sat("dep-a", 1))
    assert(st.rows.size == 1)
    val row = st.rows.head
    assert(row.triggers == Map("dep-a" -> "exec-1", "dep-b" -> WaitRow.Waiting))
  }

  test("all deps satisfied -> cull releases with recorded sources") {
    val st = Seq(sat("dep-a", 1), sat("dep-b", 2)).foldLeft(emptyState)(
      (s, e) => applyDepSatisfied(s, meta2, e))
    val (st2, releases, dropped) = cull(st, now, 300, 86400)
    assert(st2.rows.isEmpty && dropped.isEmpty)
    assert(releases == List(Release("dependencies", Some("exec-1"), 0,
      Map("dep-a" -> "exec-1", "dep-b" -> "exec-2"), "inc-000000000001-p")))
  }

  test("oldest-first: a second event for the same dep opens a second row") {
    val st = Seq(sat("dep-a", 1), sat("dep-a", 2)).foldLeft(emptyState)(
      (s, e) => applyDepSatisfied(s, meta2, e))
    assert(st.rows.size == 2)
    assert(st.rows.count(_.triggers("dep-a") != WaitRow.Waiting) == 2)
    assert(st.rows.forall(_.triggers("dep-b") == WaitRow.Waiting))
  }

  test("oldest waiting row is satisfied first (D14 sort-asc-first)") {
    val older = WaitRow("inc-old", ts("2024-01-31 10:00:00"), None, 0, "dependencies",
      Map("dep-a" -> WaitRow.Waiting, "dep-b" -> WaitRow.Waiting))
    val newer = WaitRow("inc-new", ts("2024-01-31 12:00:00"), None, 0, "dependencies",
      Map("dep-a" -> WaitRow.Waiting, "dep-b" -> WaitRow.Waiting))
    val st = applyDepSatisfied(PipelineState(List(newer, older)), meta2, sat("dep-a", 9))
    assert(st.rows.find(_.objId == "inc-old").get.triggers("dep-a") == "exec-9")
    assert(st.rows.find(_.objId == "inc-new").get.triggers("dep-a") == WaitRow.Waiting)
  }

  test("culler rule i: concurrency rows past debounce re-queue with retry+1") {
    val r = WaitRow("inc-c", ts("2024-01-31 23:50:00"), Some("x"), 1, "concurrency", Map.empty)
    val (st2, rel, _) = cull(PipelineState(List(r)), now, 300, 86400)
    assert(st2.rows.isEmpty)
    assert(rel == List(Release("concurrency-requeue", Some("x"), 2, Map.empty, "inc-c")))
  }

  test("culler rule i: within debounce -> kept") {
    val r = WaitRow("inc-c", ts("2024-01-31 23:58:00"), None, 0, "concurrency", Map.empty)
    val (st2, rel, _) = cull(PipelineState(List(r)), now, 300, 86400)
    assert(st2.rows == List(r) && rel.isEmpty)
  }

  test("culler rule iii: age-out drops silently, even if satisfied") {
    val r = WaitRow("inc-o", ts("2024-01-30 10:00:00"), None, 0, "dependencies",
      Map("dep-a" -> "e1", "dep-b" -> "e2"))
    val (st2, rel, dropped) = cull(PipelineState(List(r)), now, 300, 86400)
    assert(st2.rows.isEmpty && rel.isEmpty && dropped == List("inc-o"))
  }

  test("trigger-rule: 'any' and single-dep 'all' run immediately") {
    assert(runnableNow(Meta(Some("any"), Seq("a", "b"), 0, false)))
    assert(runnableNow(Meta(Some("all"), Seq("a"), 0, false)))
    assert(runnableNow(Meta(None, Nil, 0, false)))
    assert(!runnableNow(Meta(Some("all"), Seq("a", "b"), 0, false)))
  }

  // -- properties ---------------------------------------------------------

  private val depGen = Gen.oneOf("dep-a", "dep-b")
  private val eventsGen = Gen.listOf(Gen.zip(depGen, Gen.choose(1L, 1000L))).map(_.zipWithIndex
    .map { case ((d, _), i) => sat(d, i.toLong) })

  test("property: satisfying more deps never un-releases (monotonicity)") {
    forAll(eventsGen) { evs =>
      val base = evs.foldLeft(emptyState)((s, e) => applyDepSatisfied(s, meta2, e))
      val (_, rel1, _) = cull(base, now, 300, 86400)
      val extra = applyDepSatisfied(base, meta2, sat("dep-a", 99999))
      val (_, rel2, _) = cull(extra, now, 300, 86400)
      assert(rel2.size >= rel1.size)
    }
  }

  test("property: number of satisfied slots equals number of events") {
    forAll(eventsGen) { evs =>
      val st = evs.foldLeft(emptyState)((s, e) => applyDepSatisfied(s, meta2, e))
      val satisfied = st.rows.flatMap(_.triggers.values).count(_ != WaitRow.Waiting)
      assert(satisfied == evs.size)
    }
  }

  test("property: released rows have no waiting slot; kept dependency rows do") {
    forAll(eventsGen) { evs =>
      val st = evs.foldLeft(emptyState)((s, e) => applyDepSatisfied(s, meta2, e))
      val (kept, rel, _) = cull(st, now, 300, 86400)
      rel.foreach(r => assert(!r.sources.values.exists(_ == WaitRow.Waiting)))
      kept.rows.filter(_.reason == "dependencies")
        .foreach(r => assert(r.triggers.values.exists(_ == WaitRow.Waiting)))
    }
  }

  test("retry gate boundary") {
    assert(shouldRetry(0, 1) && shouldRetry(2, 3))
    assert(!shouldRetry(1, 1) && !shouldRetry(5, 3) && !shouldRetry(0, 0))
  }
}
