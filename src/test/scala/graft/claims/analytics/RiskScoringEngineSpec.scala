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
