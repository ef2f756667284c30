package graft

import org.scalatest.funsuite.AnyFunSuite

/** The in-artifact bench regression triage (r7 verdict #4) hinges on
  * recovering per-query bands from the DRIVER's wrapper artifact —
  * whose `tail` field escapes quotes and truncates the line's head, so
  * the parser must work on escaped fragments, not clean JSON. Pinned
  * against the real `BENCH_r{N}.json` checked into the repo root. */
class BenchTriageSpec extends AnyFunSuite {

  test("prevBench recovers per-query bands from the driver's escaped, head-truncated artifact") {
    val prev = Bench.prevBench("/root/testdata/sf0.1")
    // the driver keeps only the LAST ~4 KB of output, so a partial
    // window (the r7 artifact preserves 57 of 146 rows) is expected —
    // triage covers whatever bands survive truncation
    assert(prev.size > 40, s"expected >40 recovered query bands, got ${prev.size}")
    // every recovered name is a registered query with a plausible timing
    val names = SparkEntry.queries.keySet
    prev.foreach { case (n, v) =>
      assert(names(n), s"unregistered name leaked through: $n")
      assert(v > 0 && v < 600, s"implausible timing for $n: $v")
    }
    // rows from deep inside the truncated tail are recovered too
    // (value pinned loosely: later rounds overwrite the latest artifact)
    assert(prev.contains("ns_events_anomaly") && prev.contains("ns_dedup_survivors"),
      "rows the r7 verdict triaged must be recoverable from the artifact")
  }

  test("prevBench refuses a cross-SF band (sf mismatch -> no triage)") {
    assert(Bench.prevBench("/root/testdata/sf0.01").isEmpty,
      "bands from an sf0.1 artifact must not gate an sf0.01 run")
  }
}
