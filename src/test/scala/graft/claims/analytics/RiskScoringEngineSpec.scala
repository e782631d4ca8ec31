package graft.claims.analytics

import java.time.{LocalDate, YearMonth}
import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the Scala risk engine against the independent
  * Python oracle (scripts/risk_oracle.py → risk_cases.tsv, 400
  * randomized series spanning sparse/dense/seasonal/surge/rising
  * regimes × grades × partial-month states).
  */
class RiskScoringEngineSpec extends AnyFunSuite {

  private def loadCases(): Seq[Array[String]] = {
    val url = getClass.getResource("/risk_cases.tsv")
    assert(url != null, "risk_cases.tsv missing from test resources")
    val src = Source.fromURL(url, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(_.split("\t", -1)).toList
    finally src.close()
  }

  test("matches the Python oracle on all 400 randomized series") {
    val cases = loadCases()
    assert(cases.size >= 100)
    val failures = cases.flatMap { f =>
      val id = f(0)
      val start = YearMonth.parse(f(1))
      val values = f(2).split(";").map(_.toDouble)
      val grade = if (f(3).isEmpty) None else Some(f(3))
      val target = YearMonth.parse(f(4))
      val asOf = LocalDate.parse(f(5))
      val expScore = f(6).toInt
      val expStatus = f(7)
      val expReason = f(8)

      val series = values.zipWithIndex.map { case (v, i) =>
        (start.plusMonths(i.toLong), v)
      }.toIndexedSeq
      val got = RiskScoringEngine.score(series, grade, Some(target), asOf)
      if (got.score != expScore || got.status != expStatus || got.reason != expReason)
        Some(s"case $id: got (${got.score}, ${got.status}, ${got.reason}) " +
          s"want ($expScore, $expStatus, $expReason)")
      else None
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("cold start: critical with 2+ current fires red") {
    val s = IndexedSeq((YearMonth.of(2024, 1), 1.0), (YearMonth.of(2024, 2), 2.0))
    val r = RiskScoringEngine.score(s, Some("중대"), Some(YearMonth.of(2024, 2)),
      LocalDate.of(2030, 1, 1))
    assert(r.score == 100 && r.status == "🔴")
  }

  test("current zero short-circuits") {
    val s = IndexedSeq((YearMonth.of(2024, 1), 5.0), (YearMonth.of(2024, 2), 0.0))
    val r = RiskScoringEngine.score(s, None, Some(YearMonth.of(2024, 2)),
      LocalDate.of(2030, 1, 1))
    assert(r == RiskResult(0, "", "발생 없음"))
  }

  test("UI wrapper: target month absent from history → 당월0건") {
    val s = Seq((YearMonth.of(2024, 1), 5.0), (YearMonth.of(2024, 2), 3.0))
    val r = RiskScoringEngine.calculateAdvancedRiskScore(
      s, YearMonth.of(2024, 5), None, LocalDate.of(2030, 1, 1))
    assert(r == RiskResult(0, "🟢", "당월0건"))
  }

  test("case regression: 중대 2건 at mean ≥ 0.5 is softened to 🟡 not 🔴") {
    // ref: reports/phase2_8_fix_requirement.md — '중대 | 철사' false-alarm
    // case: sparse critical with baseline ~1.0/month and 2 current
    val start = YearMonth.of(2023, 1)
    val counts = Seq(1.0, 1, 0, 1, 2, 1, 0, 1, 1, 1, 1, 2.0) // mean ≈ 0.9
    val series = counts.zipWithIndex.map { case (v, i) =>
      (start.plusMonths(i.toLong), v)
    }.toIndexedSeq
    val r = RiskScoringEngine.score(series, Some("중대"),
      Some(series.last._1), LocalDate.of(2030, 1, 1))
    assert(r.status != "🔴", s"must not red-alert: $r")
  }

  test("case regression: 일반 4→14건 surge alerts when velocity enabled") {
    // ref: '일반 | 관능' miss case — volatile general-grade history then
    // a 3.5× MoM surge; the intended velocity term pushes it to alert
    val start = YearMonth.of(2022, 1)
    val hist = Seq(5.0, 2, 6, 3, 5, 2, 6, 3, 5, 2, 6, 4) // volatile, prev=4
    val series = (hist :+ 14.0).zipWithIndex.map { case (v, i) =>
      (start.plusMonths(i.toLong), v)
    }.toIndexedSeq
    val cfgOn = RiskConfig(velocityEnabled = true)
    val on = RiskScoringEngine.score(series, Some("일반"),
      Some(series.last._1), LocalDate.of(2030, 1, 1), cfgOn)
    val off = RiskScoringEngine.score(series, Some("일반"),
      Some(series.last._1), LocalDate.of(2030, 1, 1))
    assert(on.score >= off.score)
    assert(on.score - off.score > 0, s"velocity term must add: on=$on off=$off")
    assert(on.status == "🟡" || on.status == "🔴", s"must alert: $on")
  }

  test("velocity term thresholds match the Phase 2.8 work order") {
    val start = YearMonth.of(2023, 1)
    def scoreFor(hist: Seq[Double], current: Double): Int = {
      val series = (hist :+ current).zipWithIndex.map { case (v, i) =>
        (start.plusMonths(i.toLong), v)
      }.toIndexedSeq
      RiskScoringEngine.score(series, None, Some(series.last._1),
        LocalDate.of(2030, 1, 1), RiskConfig(velocityEnabled = true)).score -
        RiskScoringEngine.score(series, None, Some(series.last._1),
          LocalDate.of(2030, 1, 1)).score
    }
    // dense volatile history (high σ keeps the z-score term small so
    // the velocity delta isn't absorbed by the 100 cap); prev month = 2
    val base = Seq(10.0, 2, 10, 2, 10, 2, 10, 2, 10, 2, 10, 2)
    assert(scoreFor(base, 14.0) == 30) // ratio 7 → +30
    assert(scoreFor(base, 5.0) == 15)  // ratio 2.5 → +15
    assert(scoreFor(base, 4.0) == 0)   // current < 5 → skip
  }

  test("score is always within [0, 100]") {
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(50)
      val start = YearMonth.of(2021, 1 + rng.nextInt(12))
      val series = (0 until n).map(i =>
        (start.plusMonths(i.toLong), rng.nextInt(20).toDouble)).toIndexedSeq
      val grade = Seq(None, Some("일반"), Some("중대"))(rng.nextInt(3))
      val r = RiskScoringEngine.score(series, grade, Some(series.last._1),
        LocalDate.of(2030, 1, 1))
      assert(r.score >= 0 && r.score <= 100, s"score ${r.score} out of range")
    }
  }
}
