package graft.claims.analytics

/** Risk-scoring constants, carried over verbatim from the reference
  * (ref: core/analytics.py:21-53 `RiskConfig`).
  */
final case class RiskConfig(
    // Data requirements
    minDataPoints: Int = 3,
    minSampleForNb: Int = 6,
    // Statistical parameters
    ewmaLambda: Double = 0.2,
    nelsonWindowBias: Int = 9,
    nelsonWindowTrend: Int = 6,
    stlMinPeriods: Int = 24,
    // Scoring weights
    scoreAccident: Int = 100,
    scoreCriticalBonus: Int = 10,
    scoreNelsonDev: Int = 30,
    scoreNelsonBias: Int = 20,
    scoreNelsonTrend: Int = 20,
    scoreMomentum: Int = 15,
    scorePartialAbs: Int = 30,
    scorePartialVel: Int = 40,
    scorePartialWarn: Int = 30,
    // Status thresholds
    thresholdRedCrit: Int = 75,
    thresholdRedGen: Int = 85,
    thresholdYelCrit: Int = 50,
    thresholdYelGen: Int = 60,
    // Safety guards
    minProgressForVelocity: Double = 0.2,
    // Dense-track MoM velocity check (ref: the Phase 2.8 work order,
    // reports/phase2_8_fix_requirement.md:58-72). The shipped reference
    // CALLS `_calculate_velocity_score` but never defines it — the
    // crash is swallowed to (⚪, 0, Err) by the UI wrapper. Default
    // false = shipped behavior (term contributes 0); true = the
    // documented intended behavior.
    velocityEnabled: Boolean = false)

object RiskConfig {
  val default: RiskConfig = RiskConfig()

  /** Critical grade set (ref: core/analytics.py:56). */
  val criticalGrades: Set[String] = Set("중대", "위험", "사고")
}
