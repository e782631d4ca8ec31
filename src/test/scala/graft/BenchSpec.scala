package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's adaptive-rep policy. BENCH_r09 recorded a 7.21 s
  * artifact value for an entry that re-measured at 0.45 s on zero-diff
  * code because BOTH reps were load-inflated past the old `min < 2 s`
  * gate and the stabilizer never fired — the policy must trigger on
  * rep disagreement at ANY magnitude.
  */
class BenchSpec extends AnyFunSuite {

  test("third rep fires on >1.5x disagreement at any magnitude") {
    // The r9 failure shape: a slow load-inflated pair still disagrees.
    assert(Bench.needsThirdRep(Seq(7.21, 3.5)))
    // Fast noisy pair (the original r8 motivation) still fires.
    assert(Bench.needsThirdRep(Seq(0.2, 0.45)))
    // Order-independent.
    assert(Bench.needsThirdRep(Seq(3.5, 7.21)))
  }

  test("agreeing reps never pay a third run") {
    // A genuinely slow entry has agreeing reps — no extra cost.
    assert(!Bench.needsThirdRep(Seq(10.0, 12.0)))
    assert(!Bench.needsThirdRep(Seq(0.30, 0.44)))
    assert(!Bench.needsThirdRep(Seq(1.0, 1.5)))
  }
}
