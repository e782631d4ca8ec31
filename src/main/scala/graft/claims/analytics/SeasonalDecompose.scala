package graft.claims.analytics

/** Classical additive seasonal decomposition, replicating statsmodels
  * `seasonal_decompose(model='additive', period=12)` exactly
  * (ref: core/analytics.py:146-148; SURVEY.md §7.5 item 3 — this is the
  * moving-average classical algorithm, NOT Loess STL):
  *
  *  - trend: centered 2×12 moving average (convolution filter
  *    [1/24, 1/12 ×11, 1/24]); first/last 6 positions undefined (NaN)
  *  - seasonal: per-phase mean of (obs − trend) over defined positions,
  *    normalized to sum 0 across the 12 phases, tiled from position 0
  *  - resid: obs − trend − seasonal (NaN where trend is NaN)
  */
object SeasonalDecompose {

  final case class Decomposition(
      trend: Array[Double], // NaN at ends
      seasonal: Array[Double],
      resid: Array[Double]) {

    def lastDefinedTrend: Double = {
      var i = trend.length - 1
      while (i >= 0 && trend(i).isNaN) i -= 1
      if (i >= 0) trend(i) else Double.NaN
    }

    def definedResiduals: IndexedSeq[Double] =
      resid.filterNot(_.isNaN).toIndexedSeq
  }

  def additive(values: IndexedSeq[Double], period: Int = 12): Decomposition = {
    val n = values.length
    require(n >= 2 * period, s"need >= ${2 * period} observations, got $n")

    // statsmodels' convolution filter, both parities: EVEN period →
    // centered 2×period MA ([0.5, 1, ..., 1, 0.5] / period, length
    // period+1); ODD period → flat centered mean (ones(period)/period)
    // — applying the even filter to an odd period would sum weights
    // (period−1)/period and bias the whole trend low.
    val half = period / 2
    val trend = Array.fill(n)(Double.NaN)
    var t = half
    while (t < n - half) {
      var s =
        if (period % 2 == 0) {
          var acc = 0.5 * values(t - half) + 0.5 * values(t + half)
          var j = t - half + 1
          while (j <= t + half - 1) { acc += values(j); j += 1 }
          acc
        } else {
          var acc = 0.0
          var j = t - half
          while (j <= t + half) { acc += values(j); j += 1 }
          acc
        }
      trend(t) = s / period
      t += 1
    }

    // per-phase averages of the detrended series over defined positions
    val phaseSum = Array.fill(period)(0.0)
    val phaseCnt = Array.fill(period)(0)
    var i = 0
    while (i < n) {
      if (!trend(i).isNaN) {
        val ph = i % period
        phaseSum(ph) += values(i) - trend(i)
        phaseCnt(ph) += 1
      }
      i += 1
    }
    val phaseAvg = Array.tabulate(period) { ph =>
      if (phaseCnt(ph) > 0) phaseSum(ph) / phaseCnt(ph) else 0.0
    }
    val grand = phaseAvg.sum / period
    val seasonalByPhase = phaseAvg.map(_ - grand)
    val seasonal = Array.tabulate(n)(i => seasonalByPhase(i % period))

    val resid = Array.tabulate(n) { i =>
      if (trend(i).isNaN) Double.NaN else values(i) - trend(i) - seasonal(i)
    }
    Decomposition(trend, seasonal, resid)
  }

  /** Seasonal component for a given series phase (0-based position mod
    * period). The reference averages all seasonal values whose calendar
    * month equals the target month (core/analytics.py:154-156); for a
    * contiguous monthly series those are all the same tiled value, so
    * phase lookup is exact.
    */
  def seasonalAtPhase(d: Decomposition, phase: Int, period: Int = 12): Double =
    if (d.seasonal.isEmpty) 0.0 else d.seasonal(phase % period)
}
