package graft.claims

import java.time.{LocalDate, YearMonth}

import graft.claims.analytics.{Distributions, RiskScoringEngine, SeasonalDecompose}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests per the rebuild test plan (SURVEY.md §5): score
  * bounds, tail-probability laws, decomposition invariants, statistics
  * identities. Uses scalacheck generators with explicit seeded
  * sampling (the scalatest-scalacheck bridge isn't in the offline
  * cache), 200 cases per property.
  */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  private def cases[T](g: Gen[T])(check: T => Unit): Unit =
    (1 to 200).foreach { i =>
      g(params, Seed(i.toLong)).foreach(check)
    }

  private val seriesGen: Gen[IndexedSeq[(YearMonth, Double)]] = for {
    n <- Gen.choose(1, 60)
    startMonth <- Gen.choose(1, 12)
    values <- Gen.listOfN(n, Gen.choose(0, 25).map(_.toDouble))
  } yield values.zipWithIndex.map { case (v, i) =>
    (YearMonth.of(2020, startMonth).plusMonths(i.toLong), v)
  }.toIndexedSeq

  private val gradeGen: Gen[Option[String]] =
    Gen.oneOf(None, Some("일반"), Some("중대"), Some("위험"), Some("사고"))

  private val caseGen: Gen[(IndexedSeq[(YearMonth, Double)], Option[String])] =
    for { s <- seriesGen; g <- gradeGen } yield (s, g)

  test("risk score is always within [0, 100] with a valid status") {
    cases(caseGen) { case (series, grade) =>
      val r = RiskScoringEngine.score(series, grade, Some(series.last._1),
        LocalDate.of(2030, 1, 1))
      assert(r.score >= 0 && r.score <= 100)
      assert(Seq("", "⚪", "🟡", "🔴", "🟢").contains(r.status))
    }
  }

  test("risk score is invariant to input ordering (sorts internally)") {
    cases(caseGen) { case (series, grade) =>
      val shuffled = new scala.util.Random(42).shuffle(series)
      val a = RiskScoringEngine.score(series, grade, Some(series.last._1),
        LocalDate.of(2030, 1, 1))
      val b = RiskScoringEngine.score(shuffled.toIndexedSeq, grade,
        Some(series.last._1), LocalDate.of(2030, 1, 1))
      assert(a == b)
    }
  }

  test("poisson cdf is monotone in k and within [0,1]") {
    val g = for { k <- Gen.choose(0, 30); mu <- Gen.choose(0.01, 20.0) } yield (k, mu)
    cases(g) { case (k, mu) =>
      val c1 = Distributions.poissonCdf(k.toDouble, mu)
      val c2 = Distributions.poissonCdf(k + 1.0, mu)
      assert(c1 >= 0 && c1 <= 1 && c2 >= c1 - 1e-12)
    }
  }

  test("nbinom cdf is monotone in k and within [0,1]") {
    val g = for {
      k <- Gen.choose(0, 30)
      r <- Gen.choose(0.1, 10.0)
      p <- Gen.choose(0.05, 0.95)
    } yield (k, r, p)
    cases(g) { case (k, r, p) =>
      val c1 = Distributions.nbinomCdf(k.toDouble, r, p)
      val c2 = Distributions.nbinomCdf(k + 1.0, r, p)
      assert(c1 >= 0 && c1 <= 1.0 + 1e-12 && c2 >= c1 - 1e-12)
    }
  }

  test("seasonal decomposition reconstructs: trend+seasonal+resid = obs") {
    cases(Gen.choose(24, 60)) { n =>
      val values = IndexedSeq.tabulate(n)(t =>
        10.0 + 3 * math.sin(2 * math.Pi * t / 12) + 0.2 * t + (t % 5))
      val d = SeasonalDecompose.additive(values, 12)
      values.indices.foreach { i =>
        if (!d.trend(i).isNaN)
          assert(math.abs(d.trend(i) + d.seasonal(i) + d.resid(i) - values(i)) < 1e-9)
      }
      // seasonal normalized to zero mean over one period
      assert(math.abs(d.seasonal.take(12).sum) < 1e-9)
    }
  }

  test("odd-period decomposition trend is unbiased (flat filter)") {
    // On a pure linear series every correctly-weighted centered mean
    // equals the series itself; the round-9 review found the even
    // 2×MA filter applied to odd periods summed weights (p−1)/p and
    // biased the trend ~1/p low. Both parities must be exact here.
    val linear = IndexedSeq.tabulate(40)(t => 3.0 + 2.0 * t)
    for (period <- Seq(7, 12)) {
      val d = SeasonalDecompose.additive(linear, period)
      linear.indices.foreach { i =>
        if (!d.trend(i).isNaN)
          assert(math.abs(d.trend(i) - linear(i)) < 1e-9,
            s"period $period, i=$i: ${d.trend(i)} vs ${linear(i)}")
      }
    }
  }

  test("sample variance matches definitional form") {
    cases(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))) { xs =>
      val v = Distributions.varSample(xs.toIndexedSeq)
      if (xs.length <= 1) assert(v == 0.0)
      else {
        val m = xs.sum / xs.length
        val expect = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
        assert(math.abs(v - expect) < 1e-6 * math.max(1.0, expect))
      }
    }
  }
}
