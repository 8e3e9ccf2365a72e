package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's pass-summarization rules, pinned as pure
  * functions: two of the round-11 review findings were silent
  * estimator bugs in exactly this logic (last-pass-as-steady-state;
  * fail-fast durations counted as timings), so the selection rules are
  * now unit-tested instead of only exercised inside a 5-minute sweep.
  */
class BenchLogicSpec extends AnyFunSuite {
  test("boxStat: /proc sampling yields sane, monotone counters " +
      "(VERDICT r13 item 1 — box-level load attribution)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("/proc/stat")))
    val a = BenchMetrics.boxStat()
    assert(a.load1 >= 0.0, "loadavg parse")
    assert(a.busyJiffies > 0L, "/proc/stat busy parse")
    assert(a.selfJiffies >= 0L, "/proc/self/stat parse")
    // burn a little CPU so self and busy both advance
    var x = 0.0
    (1 to 20000000).foreach(i => x += math.sqrt(i.toDouble))
    assert(x > 0)
    val b = BenchMetrics.boxStat()
    assert(b.busyJiffies >= a.busyJiffies, "busy jiffies monotone")
    assert(b.selfJiffies >= a.selfJiffies, "self jiffies monotone")
    // self CPU is a subset of box busy CPU over the same window
    assert(b.busyJiffies - a.busyJiffies >= b.selfJiffies - a.selfJiffies,
      "self delta cannot exceed box busy delta")
  }


  test("minSuccessful: min over successful passes only") {
    assert(Bench.minSuccessful(Seq((2.0, true), (1.2, true))) === Some(1.2))
    // a failed pass's fail-fast duration must never win
    assert(Bench.minSuccessful(Seq((0.1, false), (1.2, true))) === Some(1.2))
  }

  test("minSuccessful: zero successful passes reports None, not a timing") {
    assert(Bench.minSuccessful(Seq((0.1, false), (0.2, false))) === None)
    assert(Bench.minSuccessful(Seq.empty) === None)
  }

  test("needsTieBreak: >1.5x AND >0.5s disagreement between successful " +
    "passes") {
    assert(Bench.needsTieBreak(Seq((1.0, true), (1.6, true))))
    // agreement — fast or slow — earns no extra pass
    assert(!Bench.needsTieBreak(Seq((1.0, true), (1.4, true))))
    assert(!Bench.needsTieBreak(Seq((6.0, true), (6.2, true))))
    // a wide RATIO with a small absolute spread is pass-1 codegen
    // overhead on a short query, not a stall worth re-measuring
    assert(!Bench.needsTieBreak(Seq((0.55, true), (0.95, true))))
  }

  test("needsTieBreak: sub-0.5s queries and single-opinion runs are skipped") {
    // below the floor no gate can see the difference
    assert(!Bench.needsTieBreak(Seq((0.1, true), (0.4, true))))
    // one successful pass has no second opinion to disagree with
    assert(!Bench.needsTieBreak(Seq((1.0, true), (9.9, false))))
    assert(!Bench.needsTieBreak(Seq((1.0, true))))
  }

  test("warmUpMs: first-pass tax over the min, -1 when pass 1 failed " +
      "(VERDICT r14 item 1 — the tier-warm-up proxy field)") {
    // typical shape: cold first pass, warm min
    assert(Bench.warmUpMs(Seq((2.5, true), (1.0, true)), 1.0) === 1500L)
    // first pass IS the min: zero tax, never negative
    assert(Bench.warmUpMs(Seq((1.0, true), (1.3, true)), 1.0) === 0L)
    // a failed first pass's fail-fast duration is not a warm-up sample
    assert(Bench.warmUpMs(Seq((0.1, false), (1.2, true)), 1.2) === -1L)
    assert(Bench.warmUpMs(Seq.empty, 1.0) === -1L)
  }

  test("tie-break composes with minSuccessful: the extra pass can only lower") {
    val base = Seq((5.0, true), (2.0, true))
    assert(Bench.needsTieBreak(base))
    assert(Bench.minSuccessful(base :+ ((1.8, true))) === Some(1.8))
    // a failed tie-break pass leaves the original min standing
    assert(Bench.minSuccessful(base :+ ((0.1, false))) === Some(2.0))
  }
}
