package graft.ml

/** M2 — ArimaLite: the SARIMAX(p,d,q)×(P,D,Q,12) API slot
  * (ref: core/engine/models.py:83-173). statsmodels' state-space
  * estimator has no Spark/JVM equivalent, so this fits the
  * ARIMA-family model by the public Hannan–Rissanen two-stage method:
  * (1) difference d times + seasonally difference D times,
  * (2) OLS on p AR lags + P seasonal-AR lags (+ exog),
  * (3) second OLS adding q/Q lagged-residual regressors,
  * then recursive forecasting with differencing inversion. The
  * (order, seasonal_order, exog) API matches the reference; the
  * estimator differs and is documented as such (SURVEY.md §7.4).
  *
  * Like the reference SARIMAX, predicting without the exog it was
  * trained with throws — callers rely on that for the allocation
  * fallback (ref: trainer.py:85-91; SURVEY.md §7.5 item 7).
  */
final class ArimaLiteModel(
    val p: Int, val d: Int, val q: Int,
    val P: Int, val D: Int, val Q: Int,
    val s: Int = 12) extends ForecastModel {

  override def name: String = "SARIMAX"

  private var coef: Array[Double] = _
  private var trainDiffed: Array[Double] = _
  private var trainRaw: Array[Double] = _
  private var usedExog: Boolean = false
  private var intercept: Double = 0.0

  private def difference(y: Array[Double], lag: Int): Array[Double] =
    y.drop(lag).zip(y.dropRight(lag)).map { case (a, b) => a - b }

  private def applyDiffs(y: Array[Double]): Array[Double] = {
    var cur = y
    (1 to d).foreach(_ => cur = difference(cur, 1))
    (1 to D).foreach(_ => cur = difference(cur, s))
    cur
  }

  private def maxLag: Int = math.max(if (p > 0) p else 0,
    if (P > 0) P * s else 0)

  private var trainExogRaw: Array[Double] = Array.empty

  override def fit(y: Array[Double], exog: Option[Array[Double]]): Unit = {
    trainRaw = y.clone()
    usedExog = exog.isDefined
    trainExogRaw = exog.map(_.clone()).getOrElse(Array.empty)
    val z = applyDiffs(y)
    trainDiffed = z
    val lag0 = maxLag
    if (z.length <= lag0 + 2 || (p == 0 && P == 0 && q == 0 && Q == 0)) {
      // degenerate: mean model on the differenced series
      coef = Array.empty
      intercept = if (z.nonEmpty) z.sum / z.length else 0.0
      isFitted = true
      return
    }
    val exogZ = exog.map(e => applyDiffs(e))
    def features(t: Int, resids: Option[Array[Double]]): Array[Double] = {
      val ar = (1 to p).map(i => z(t - i))
      val sar = (1 to P).map(i => z(t - i * s))
      val ma = resids.map(r =>
        ((1 to q).map(i => if (t - i >= 0) r(t - i) else 0.0) ++
          (1 to Q).map(i => if (t - i * s >= 0) r(t - i * s) else 0.0)))
        .getOrElse(Seq.empty)
      val ex = exogZ.map(e => Seq(e(math.min(t, e.length - 1)))).getOrElse(Seq.empty)
      (Seq(1.0) ++ ar ++ sar ++ ma ++ ex).toArray
    }
    // stage 1: AR-only OLS → residuals
    val idxs = (lag0 until z.length).toArray
    val x1 = idxs.map(t => features(t, None))
    val b1 = idxs.map(z)
    val c1 = LinAlg.solveNormal(x1, b1)
    val resids = Array.fill(z.length)(0.0)
    idxs.foreach { t =>
      val pred = x1(t - lag0).zip(c1).map { case (a, b) => a * b }.sum
      resids(t) = z(t) - pred
    }
    // stage 2: AR + lagged-residual OLS
    val x2 = idxs.map(t => features(t, Some(resids)))
    val c2 = LinAlg.solveNormal(x2, b1)
    coef = c2
    this.residuals = resids
    isFitted = true
  }

  private var residuals: Array[Double] = Array.empty

  override def predict(steps: Int, exog: Option[Array[Double]]): Array[Double] = {
    require(isFitted, "model not fitted")
    if (usedExog && exog.isEmpty)
      throw new IllegalArgumentException(
        s"$name trained with exog requires future exog") // ref fallback path
    val z = scala.collection.mutable.ArrayBuffer(trainDiffed: _*)
    val res = scala.collection.mutable.ArrayBuffer(residuals: _*)
    val exogFuture = exog.map(e => applyDiffs(trainExogRaw ++ e).takeRight(steps))
    val lag0 = maxLag
    val preds = (0 until steps).map { h =>
      val t = z.length
      val v =
        if (coef.isEmpty) intercept
        else {
          val ar = (1 to p).map(i => if (t - i >= 0) z(t - i) else 0.0)
          val sar = (1 to P).map(i => if (t - i * s >= 0) z(t - i * s) else 0.0)
          val ma = (1 to q).map(i => if (t - i >= 0) res(t - i) else 0.0) ++
            (1 to Q).map(i => if (t - i * s >= 0) res(t - i * s) else 0.0)
          val ex = exogFuture.map(e => Seq(e(math.min(h, e.length - 1)))).getOrElse(Seq.empty)
          val feats = (Seq(1.0) ++ ar ++ sar ++ ma ++ ex).toArray
          feats.zip(coef).map { case (a, b) => a * b }.sum
        }
      z += v
      res += 0.0 // future residuals unknown → 0 (standard forecast recursion)
      v
    }.toArray
    invertDiffs(preds)
  }

  /** Invert the d + D differencing to return to the original scale. */
  private def invertDiffs(diffPreds: Array[Double]): Array[Double] = {
    // reconstruct level forecasts by cumulating from the training tail
    var layers = List(trainRaw)
    var cur = trainRaw
    (1 to d).foreach { _ => cur = difference(cur, 1); layers ::= cur }
    (1 to D).foreach { _ => cur = difference(cur, s); layers ::= cur }
    // layers.head is the fully differenced series; walk back up
    var preds = diffPreds
    var remaining = layers
    while (remaining.tail.nonEmpty) {
      val lower = remaining.head      // differenced layer the preds live in
      val upper = remaining.tail.head // one less differenced
      val lag = if (upper.length - lower.length == s) s else 1
      val hist = scala.collection.mutable.ArrayBuffer(upper: _*)
      preds = preds.map { dp =>
        val v = dp + hist(hist.length - lag)
        hist += v
        v
      }
      remaining = remaining.tail
    }
    preds
  }
}

/** M4-slot substitute — local ridge regression on lag features with
  * recursive rollout and a ≥0 clamp, mirroring the LSTM slot's
  * windowed-feature shape (ref: core/engine/models.py:310-474; no JVM
  * LSTM — SURVEY.md §7.4 keeps the 3-model leaderboard with this
  * windowed-regressor substitute).
  */
final class RidgeLagModel(val lookback: Int, val ridge: Double = 1.0)
    extends ForecastModel {
  override def name: String = "LSTM"

  private var coef: Array[Double] = _
  private var tail: Array[Double] = _
  private var yMin = 0.0
  private var yMax = 1.0

  override def fit(y: Array[Double], exog: Option[Array[Double]]): Unit = {
    require(y.length > lookback, s"need > $lookback points")
    yMin = y.min; yMax = math.max(y.max, yMin + 1e-9)
    val norm = y.map(v => (v - yMin) / (yMax - yMin)) // min-max like the ref LSTM
    val rows = (lookback until norm.length).toArray
    val x = rows.map(t => Array(1.0) ++ (1 to lookback).map(i => norm(t - i)))
    val b = rows.map(norm)
    coef = LinAlg.solveNormal(x, b, ridge)
    tail = norm.takeRight(lookback)
    isFitted = true
  }

  override def predict(steps: Int, exog: Option[Array[Double]]): Array[Double] = {
    require(isFitted)
    val window = scala.collection.mutable.ArrayBuffer(tail: _*)
    (0 until steps).map { _ =>
      val feats = Array(1.0) ++ (1 to lookback).map(i => window(window.length - i))
      val v = feats.zip(coef).map { case (a, b) => a * b }.sum
      val out = math.max(0.0, v * (yMax - yMin) + yMin) // clamp >= 0 like the ref LSTM rollout
      // feed back the CLAMPED value (re-normalized): the rollout must
      // extrapolate from the trajectory it reports, or a series
      // trending through zero drives later steps below any published
      // forecast
      window += (out - yMin) / (yMax - yMin)
      out
    }.toArray
  }
}

/** Seasonal-naive baseline: forecast = same calendar month last year
  * (mean fallback for short series). Keeps the leaderboard honest.
  */
final class SeasonalNaiveModel(val s: Int = 12) extends ForecastModel {
  override def name: String = "SeasonalNaive"
  private var y: Array[Double] = _
  override def fit(series: Array[Double], exog: Option[Array[Double]]): Unit = {
    y = series.clone(); isFitted = true
  }
  override def predict(steps: Int, exog: Option[Array[Double]]): Array[Double] =
    (1 to steps).map { h =>
      if (y.length >= s) y(y.length - s + ((h - 1) % s))
      else if (y.nonEmpty) y.sum / y.length
      else 0.0
    }.toArray
}
