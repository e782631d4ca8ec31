package graft.claims.analytics

import java.time.{LocalDate, YearMonth}

/** Statistical risk-scoring engine — a faithful pure-Scala re-expression
  * of the reference's `RiskScoringEngine` (ref: core/analytics.py:58-388).
  * Regimes, guards, weights, thresholds, and reason strings replicate
  * the reference exactly; see RiskConfig for the constants.
  *
  * Deliberate divergences (documented reference bugs, SURVEY.md §7.5):
  *  - `_calculate_velocity_score` (core/analytics.py:286) is called but
  *    never defined in the reference — an AttributeError swallowed by
  *    the UI wrapper's bare except, so the shipped dense track returns
  *    (⚪, 0, "Err") through that path. The intended velocity semantics
  *    live in the partial-month penalty (which IS implemented); the
  *    vestigial dense-track term is treated as 0 here.
  *  - wall-clock `datetime.now()` (core/analytics.py:72) is injected as
  *    `asOf` for determinism (SURVEY.md §7.5 item 4).
  *
  * Pure in-memory per-series computation: series are monthly (≤ a few
  * hundred points), so this runs inside `mapGroups` per key —
  * embarrassingly parallel across the millions of keys a 100 TB hub
  * would produce, with per-group state bounded by months, not rows.
  */
final case class RiskResult(score: Int, status: String, reason: String)

object RiskScoringEngine {

  /** Entry mirroring the reference constructor: a sorted monthly series
    * (contiguous, zero-filled), optional grade, the target month, and
    * the as-of date standing in for "today".
    */
  def score(
      series: IndexedSeq[(YearMonth, Double)],
      grade: Option[String],
      targetMonth: Option[YearMonth],
      asOf: LocalDate,
      cfg: RiskConfig = RiskConfig.default): RiskResult =
    new RiskScoringEngine(series.sortBy(_._1), grade, targetMonth, asOf, cfg)
      .calculate()

  /** UI wrapper (ref: core/analytics.py:411-426): slice the history up
    * to the target month; target absent from the index → 🟢 "당월0건";
    * any internal failure → ⚪ "Err".
    */
  def calculateAdvancedRiskScore(
      history: Seq[(YearMonth, Double)],
      targetMonth: YearMonth,
      grade: Option[String],
      asOf: LocalDate,
      cfg: RiskConfig = RiskConfig.default): RiskResult =
    try {
      val sorted = history.sortBy(_._1).toIndexedSeq
      if (!sorted.exists(_._1 == targetMonth))
        RiskResult(0, "🟢", "당월0건")
      else {
        val relevant = sorted.takeWhile(_._1.compareTo(targetMonth) <= 0)
        score(relevant, grade, Some(targetMonth), asOf, cfg)
      }
    } catch {
      case scala.util.control.NonFatal(_) => RiskResult(0, "⚪", "Err")
    }
}

final class RiskScoringEngine(
    series: IndexedSeq[(YearMonth, Double)],
    grade: Option[String],
    targetMonth: Option[YearMonth],
    asOf: LocalDate,
    cfg: RiskConfig) {

  import Distributions._

  private val isCritical = grade.exists(RiskConfig.criticalGrades.contains)

  // Partial-month state (ref: core/analytics.py:64-82)
  private val (isPartialMonth, progressRatio): (Boolean, Double) =
    targetMonth match {
      case Some(tm) if tm.getYear == asOf.getYear && tm.getMonthValue == asOf.getMonthValue =>
        val dayOfMonth = math.max(1, asOf.getDayOfMonth)
        val daysInMonth = tm.lengthOfMonth
        (true, dayOfMonth.toDouble / daysInMonth)
      case _ => (false, 1.0)
    }

  private val currentValue: Double =
    if (series.nonEmpty) series.last._2 else 0.0
  private val currentDate: Option[YearMonth] = series.lastOption.map(_._1)
  private val history: IndexedSeq[Double] = series.dropRight(1).map(_._2)
  private val historyMonths: IndexedSeq[Int] =
    series.dropRight(1).map(_._1.getMonthValue)

  private val nObs = history.length
  private val histMean = if (nObs > 0) mean(history) else 0.0
  private val histStd = if (nObs > 1) stdSample(history) else 0.0
  private val histVar = if (nObs > 1) varSample(history) else 0.0

  // Regime: sparse if mean < 1.0 or zero-ratio > 0.5 (ref: :97-99)
  private val zeroRatio =
    if (nObs > 0) history.count(_ == 0.0).toDouble / nObs else 0.0
  private val isSparse = histMean < 1.0 || zeroRatio > 0.5

  /** Track A — sparse scoring (ref: core/analytics.py:101-129). */
  private def sparseScore(): (Double, String) =
    if (histMean == 0.0) {
      (if (currentValue > 0) 100.0 else 0.0, "희소유형 돌발 발생")
    } else {
      val useNbinom =
        nObs >= cfg.minSampleForNb && histVar > 1.2 * histMean
      val pVal =
        if (useNbinom) {
          val pEst = histMean / histVar
          val rEst = histMean * pEst / (1.0 - pEst)
          1.0 - nbinomCdf(currentValue - 1, rEst, pEst)
        } else
          1.0 - poissonCdf(currentValue - 1, histMean)
      val raw =
        if (pVal < 1e-5) 100.0
        else math.min(100.0, math.max(0.0, -math.log10(pVal) * 25.0))
      (raw, "분포 이탈")
    }

  /** Momentum: 3 consecutive rises and current ≥ 3 (ref: :131-142). */
  private def momentumScore(): Double =
    if (nObs < 2) 0.0
    else {
      val t1 = history(nObs - 1)
      val t2 = history(nObs - 2)
      if (currentValue > t1 && t1 > t2 && currentValue >= 3) cfg.scoreMomentum
      else 0.0
    }

  /** Track B — z-score, STL-adjusted when n ≥ 24 and σ > 0
    * (ref: core/analytics.py:144-167).
    */
  private def zScoreWithStl(): (Double, String) = {
    if (nObs >= cfg.stlMinPeriods && histStd > 0) {
      try {
        val dec = SeasonalDecompose.additive(history, 12)
        val residuals = dec.definedResiduals
        val residMean = mean(residuals)
        val residStd = stdSample(residuals)
        val lastTrend = dec.lastDefinedTrend
        val targetMonthIdx = currentDate.map(_.getMonthValue).getOrElse(1)
        // mean of seasonal values whose calendar month == target month
        val seasonalVals = historyMonths.zipWithIndex.collect {
          case (m, i) if m == targetMonthIdx => dec.seasonal(i)
        }
        val currentSeasonal =
          if (seasonalVals.nonEmpty) seasonalVals.sum / seasonalVals.length
          else Double.NaN
        val expected = lastTrend + currentSeasonal
        val currentResid = currentValue - expected
        val z = (currentResid - residMean) / (residStd + 1e-6)
        if (z.isNaN) throw new ArithmeticException("NaN z")
        return (z, "정상패턴 이탈")
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    ((currentValue - histMean) / (histStd + 1e-6), "평균 대비 급증")
  }

  /** Nelson rules with CV-adaptive limits (ref: core/analytics.py:169-212). */
  private def nelsonRules(zScore: Double): (Double, List[String]) = {
    var scoreAdd = 0.0
    val triggered = scala.collection.mutable.ListBuffer.empty[String]
    val full = series.map(_._2)

    val cv = if (histMean > 0) histStd / histMean else 0.0
    val baseLimit = if (isCritical) 2.5 else 3.0
    val limitZ =
      if (cv < 0.1 && histMean > 1.0) 2.0
      else if (cv > 0.5) 3.5
      else baseLimit
    val warnZ = math.max(1.5, limitZ - 1.0)

    // Rule 1: limit violation (half score above warn)
    if (math.abs(zScore) > limitZ) {
      triggered += "정상범위 이탈"
      scoreAdd += cfg.scoreNelsonDev
    } else if (math.abs(zScore) > warnZ)
      scoreAdd += cfg.scoreNelsonDev / 2.0

    // Rule 2: bias — last 9 all above historical mean
    if (full.length >= cfg.nelsonWindowBias) {
      val lastN = full.takeRight(cfg.nelsonWindowBias)
      if (lastN.forall(_ > histMean)) {
        triggered += s"지속적 상승 - ${cfg.nelsonWindowBias}개월"
        scoreAdd += cfg.scoreNelsonBias
      }
    }

    // Rule 3: trend — last 6 strictly rising
    if (full.length >= cfg.nelsonWindowTrend) {
      val lastN = full.takeRight(cfg.nelsonWindowTrend)
      val diffs = lastN.sliding(2).map(w => w(1) - w(0)).toSeq
      if (diffs.nonEmpty && diffs.forall(_ > 0)) {
        triggered += s"지속적 상승 - (${cfg.nelsonWindowTrend}개월)"
        scoreAdd += cfg.scoreNelsonTrend
      }
    }
    (scoreAdd, triggered.toList)
  }

  /** Dense-track MoM velocity (the Phase 2.8 intended implementation,
    * reports/phase2_8_fix_requirement.md:58-72; only active when
    * cfg.velocityEnabled — see RiskConfig): skip below 5 current or
    * (prev 0 and current < 3); ratio vs max(prev, 0.5): ≥3× → +30,
    * ≥2× → +15.
    */
  private def velocityScore(): Double = {
    if (!cfg.velocityEnabled || nObs < 1) return 0.0
    val prev = history.last
    if (prev == 0 && currentValue < 3) return 0.0
    if (currentValue < 5) return 0.0
    val denom = if (prev > 0) prev else 0.5
    val ratio = currentValue / denom
    if (ratio >= 3.0) 30.0
    else if (ratio >= 2.0) 15.0
    else 0.0
  }

  /** EWMA control (adjust=False recursion; ref: core/analytics.py:281-283). */
  private def ewmaScore(): Double = {
    val xs = series.map(_._2)
    if (xs.isEmpty) return 0.0
    var e = xs.head
    xs.tail.foreach(x => e = (1 - cfg.ewmaLambda) * e + cfg.ewmaLambda * x)
    val controlSigma =
      histStd * math.sqrt(cfg.ewmaLambda / (2 - cfg.ewmaLambda))
    val zEwma = (e - histMean) / (controlSigma + 1e-6)
    if (math.abs(zEwma) > 3.0) 15.0 else 0.0
  }

  /** Full scoring pipeline (ref: core/analytics.py:214-388). */
  def calculate(): RiskResult = {
    // 0. nothing happened this month
    if (currentValue == 0)
      return RiskResult(0, "", "발생 없음")

    // 1. partial-month early warning
    var partialPenalty = 0.0
    var partialReason = ""
    if (isPartialMonth && currentValue > 1) {
      if (currentValue >= histMean && histMean > 0 && progressRatio < 0.7) {
        partialPenalty = cfg.scorePartialAbs
        partialReason = "상승세 가속"
      } else if (progressRatio >= cfg.minProgressForVelocity) {
        val expectedCurrent = histMean * progressRatio
        if (expectedCurrent > 0.5 && currentValue > expectedCurrent * 4.0) {
          partialPenalty = cfg.scorePartialVel
          partialReason = "상승세 가속"
        } else if (expectedCurrent > 0.5 && currentValue > expectedCurrent * 2.5 && isCritical) {
          partialPenalty = cfg.scorePartialWarn
          partialReason = "상승세 가속"
        }
      }
    }

    // 3. cold start (ref: :247-257). NOTE the reference's exact branch
    // shape: critical with current < 2 does NOT return here — it falls
    // through to the main scoring below.
    if (nObs < cfg.minDataPoints) {
      if (isCritical) {
        if (currentValue >= 2)
          return RiskResult(100, "🔴", s"초기급증($partialReason)")
      } else {
        return (
          if (currentValue >= 3) RiskResult(50, "🟡", s"초기주의($partialReason)")
          else RiskResult(0, "⚪", "데이터 부족"))
      }
    }

    // 4. main scoring
    var totalScore = 0.0
    var methodStr = ""
    var triggeredRules = List.empty[String]
    var zScoreVal = 0.0

    if (isSparse) {
      val (probScore, m) = sparseScore()
      methodStr = m
      val prevVal = if (history.nonEmpty) history.last else 0.0
      val trendScore =
        if (prevVal > 0 && currentValue / prevVal >= 3.0 && currentValue >= 3) 20.0
        else 0.0
      totalScore = probScore + trendScore
    } else {
      val (z, zMethod) = zScoreWithStl()
      zScoreVal = z
      methodStr = zMethod
      val startSigma = if (isCritical) 0.5 else 1.0
      val baseScore = math.min(50.0, math.max(0.0, (z - startSigma) * 25.0))
      val (nelsonScore, rules) = nelsonRules(z)
      triggeredRules = rules
      // NOTE: the shipped reference adds `_calculate_velocity_score()`
      // here, which is undefined (see class scaladoc) — 0 by default;
      // the documented intended term activates via cfg.velocityEnabled.
      totalScore = baseScore + nelsonScore + ewmaScore() + velocityScore()
    }

    val momentum = momentumScore()
    if (momentum > 0) triggeredRules = triggeredRules :+ "연속 상승 모멘텀"
    totalScore += momentum

    // 5. final aggregation
    totalScore += partialPenalty
    if (isCritical && totalScore > 0) totalScore += cfg.scoreCriticalBonus
    totalScore = math.min(100.0, totalScore)

    // Safe zone (dense only; ref: :304-319)
    if (!isSparse) {
      val inSafeRange = currentValue < 3 && zScoreVal < 0.8
      val hasPatternIssue = triggeredRules.nonEmpty
      if (inSafeRange && !hasPatternIssue && partialReason.isEmpty)
        return RiskResult(0, "⚪", "정상범주")
    }

    // 1-count suppression (ref: :321-333; the general-grade cap is
    // THRESHOLD_YEL_GEN − 1 = 59 — the reference's "49" comment is stale)
    if (currentValue == 1) {
      val isFirstOccurrence = histMean == 0.0
      val isRareBreakout = isSparse && history.nonEmpty && history.last == 0.0
      if (isFirstOccurrence || isRareBreakout) {
        if (!isCritical)
          totalScore = math.min(totalScore, cfg.thresholdYelGen - 1.0)
      } else {
        totalScore = math.min(totalScore, 30.0)
        partialReason = ""
      }
    }

    // 6. status + reason consolidation (ref: :335-388)
    var reasonParts = List.empty[String]
    if (partialReason.nonEmpty) reasonParts :+= partialReason
    reasonParts ++= triggeredRules
    if (reasonParts.isEmpty) reasonParts :+= methodStr

    val sudden = reasonParts.filter(p =>
      Seq("희소유형 돌발 발생", "분포 이탈").exists(p.contains))
    val trend = reasonParts.filter(p =>
      Seq("정상패턴 이탈", "정상범위 이탈", "평균 대비 급증").exists(p.contains))
    val momentumParts = reasonParts.filter(p =>
      Seq("지속적 상승", "연속 상승 모멘텀", "상승세 가속").exists(p.contains))

    var reasonStr = ""
    if (sudden.nonEmpty) reasonStr = s"⚡돌발감지(${sudden.mkString(", ")})"
    if (trend.nonEmpty) {
      if (reasonStr.nonEmpty) reasonStr += " / "
      reasonStr += s"📊추세이탈(${trend.mkString(", ")})"
    }
    if (momentumParts.nonEmpty) {
      if (reasonStr.nonEmpty) reasonStr += " / "
      reasonStr += s"📈급증감지(${momentumParts.mkString(", ")})"
    }
    if (reasonStr.isEmpty)
      reasonStr = if (methodStr.nonEmpty) methodStr else "정상범주"

    val thrRed = if (isCritical) cfg.thresholdRedCrit else cfg.thresholdRedGen
    val thrYel = if (isCritical) cfg.thresholdYelCrit else cfg.thresholdYelGen

    var finalStatus = "⚪"
    if (totalScore >= thrRed) finalStatus = "🔴"
    else if (totalScore >= thrYel) finalStatus = "🟡"

    if (isSparse && currentValue == 2 && isCritical && histMean >= 0.5)
      finalStatus = "🟡"

    if (finalStatus == "⚪") RiskResult(totalScore.toInt, "⚪", "정상범주")
    else RiskResult(totalScore.toInt, finalStatus, reasonStr)
  }
}
