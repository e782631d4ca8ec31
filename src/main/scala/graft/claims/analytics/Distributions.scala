package graft.claims.analytics

/** Tail probabilities for the sparse-track scoring
  * (ref: core/analytics.py:101-129 — scipy `poisson.cdf` /
  * `nbinom.cdf`). Monthly claim counts are small integers, so direct
  * pmf summation is exact, fast, and dependency-free.
  */
object Distributions {

  /** P(X ≤ k) for X ~ Poisson(mu). k < 0 → 0. Matches scipy's
    * integer-floor handling of k.
    */
  def poissonCdf(k: Double, mu: Double): Double = {
    val kk = math.floor(k).toInt
    if (kk < 0) return 0.0
    if (mu <= 0.0) return 1.0
    var pmf = math.exp(-mu) // P(X = 0)
    var cdf = pmf
    var i = 1
    while (i <= kk) {
      pmf *= mu / i
      cdf += pmf
      i += 1
    }
    math.min(1.0, cdf)
  }

  /** P(X ≤ k) for X ~ NegativeBinomial(r, p) in scipy's
    * parameterization: pmf(i) = C(i+r-1, i) p^r (1-p)^i, i = 0,1,…
    * Supports non-integer r via the iterative pmf recurrence
    * pmf(i) = pmf(i-1) · (i+r-1)/i · (1-p).
    */
  def nbinomCdf(k: Double, r: Double, p: Double): Double = {
    val kk = math.floor(k).toInt
    if (kk < 0) return 0.0
    if (p >= 1.0) return 1.0
    if (p <= 0.0 || r <= 0.0) return Double.NaN
    var pmf = math.pow(p, r) // P(X = 0)
    var cdf = pmf
    var i = 1
    while (i <= kk) {
      pmf *= (i + r - 1.0) / i * (1.0 - p)
      cdf += pmf
      i += 1
    }
    math.min(1.0, cdf)
  }

  /** Sample mean (0.0 for empty — ref: core/analytics.py:92). */
  def mean(xs: IndexedSeq[Double]): Double =
    if (xs.isEmpty) 0.0 else xs.sum / xs.length

  /** Sample variance ddof=1 (0.0 for n ≤ 1 — ref: core/analytics.py:93-94
    * guards; pandas `.var()` default ddof=1).
    */
  def varSample(xs: IndexedSeq[Double]): Double =
    if (xs.length <= 1) 0.0
    else {
      val m = mean(xs)
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }

  /** Sample stddev ddof=1 (pandas `.std()`). */
  def stdSample(xs: IndexedSeq[Double]): Double = math.sqrt(varSample(xs))
}
