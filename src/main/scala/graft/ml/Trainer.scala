package graft.ml

import scala.util.Random

/** M6 — hyperparameter tuning. The reference uses Optuna TPE
  * (trainer.py:199-367); the rebuild substitutes seeded random search
  * over the SAME spaces with the same API shape: nTrials (default 20),
  * objective = test RMSE on the time-ordered split, failed trial → ∞
  * (SURVEY.md §2.9 M6).
  *
  * Search spaces carried over verbatim (trainer.py:209-212, 267-269,
  * 321-324): SARIMAX p,d,q ∈ 0–2, P ∈ 0–2, D ∈ 0–1, Q ∈ 0–2;
  * lag model lag_features ∈ 1–6, iterations ∈ {50..500 step 50};
  * windowed model lookback ∈ 6–24.
  */
final class Tuner(val testMonths: Int = 3, val nTrials: Int = 20,
    val seed: Long = 42L) extends Serializable {

  import ForecastModel._

  final case class Trial(params: Map[String, Int], rmse: Double)

  private def search(space: Random => Map[String, Int],
      mk: Map[String, Int] => ForecastModel,
      yTrain: Array[Double], yTest: Array[Double],
      exogTrain: Option[Array[Double]], exogTest: Option[Array[Double]]): Trial = {
    val rng = new Random(seed)
    var best = Trial(Map.empty, Double.MaxValue)
    (1 to nTrials).foreach { _ =>
      val params = space(rng)
      val score =
        try {
          val m = mk(params)
          m.fit(yTrain, exogTrain)
          rmse(yTest, m.predict(yTest.length, exogTest))
        } catch { case scala.util.control.NonFatal(_) => Double.MaxValue }
      if (score < best.rmse) best = Trial(params, score)
    }
    best
  }

  def tuneSarimax(yTrain: Array[Double], yTest: Array[Double],
      exogTrain: Option[Array[Double]] = None,
      exogTest: Option[Array[Double]] = None): Trial =
    search(
      rng => Map("p" -> rng.nextInt(3), "d" -> rng.nextInt(3),
        "q" -> rng.nextInt(3), "P" -> rng.nextInt(3),
        "D" -> rng.nextInt(2), "Q" -> rng.nextInt(3)),
      ps => new ArimaLiteModel(ps("p"), ps("d"), ps("q"),
        ps("P"), ps("D"), ps("Q")),
      yTrain, yTest, exogTrain, exogTest)

  def tuneLagModel(yTrain: Array[Double], yTest: Array[Double],
      exogTrain: Option[Array[Double]] = None,
      exogTest: Option[Array[Double]] = None,
      mk: Map[String, Int] => ForecastModel): Trial =
    search(
      rng => Map("lag_features" -> (1 + rng.nextInt(6)),
        "iterations" -> ((1 + rng.nextInt(10)) * 50)),
      mk, yTrain, yTest, exogTrain, exogTest)

  def tuneWindowed(yTrain: Array[Double], yTest: Array[Double]): Trial =
    search(
      rng => Map("lookback" -> (6 + rng.nextInt(19))),
      ps => new RidgeLagModel(math.min(ps("lookback"), math.max(1, yTrain.length - 1))),
      yTrain, yTest, None, None)

  /** M6 API — tune all competing models (ref: trainer.py:369-398). */
  def tuneAll(y: Array[Double], exog: Option[Array[Double]] = None)
      : Map[String, Trial] = {
    val (yTr, yTe) = timeSplit(y, testMonths)
    val (exTr, exTe) = exog.map(e => timeSplit(e, testMonths))
      .map { case (a, b) => (Some(a), Some(b)) }.getOrElse((None, None))
    Map(
      "SARIMAX" -> tuneSarimax(yTr, yTe, exTr, exTe),
      "CatBoost" -> tuneLagModel(yTr, yTe, exTr, exTe,
        ps => new RidgeLagModel(math.min(ps("lag_features"),
          math.max(1, yTr.length - 1)))),
      "LSTM" -> tuneWindowed(yTr, yTe))
  }
}

/** M7/M8 — champion selection + final forecast
  * (ref: trainer.py:405-570): retrain candidates on tuned params, rank
  * by test RMSE, champion = min; final forecast refits on the full
  * series; 95% CI = ŷ ± 1.96 × test-RMSE floored at 0.
  */
final class ChampionSelector(val testMonths: Int = 3) extends Serializable {

  import ForecastModel._

  final case class Entry(model: String, rmse: Double)
  final case class Forecast(
      predictions: Array[Double], lower: Array[Double], upper: Array[Double],
      champion: String, testRmse: Double)

  var leaderboard: Seq[Entry] = Seq.empty
  var champion: Option[ForecastModel] = None
  var championRmse: Double = Double.NaN

  def trainModels(y: Array[Double], exog: Option[Array[Double]],
      tuned: Map[String, Tuner.ParamsLike]): Seq[Entry] = {
    val (yTr, yTe) = timeSplit(y, testMonths)
    val (exTr, exTe) = exog.map(e => timeSplit(e, testMonths))
      .map { case (a, b) => (Some(a), Some(b)) }.getOrElse((None, None))
    val candidates: Seq[(String, () => ForecastModel)] = Seq(
      "SARIMAX" -> (() => {
        val ps = tuned("SARIMAX")
        new ArimaLiteModel(ps("p"), ps("d"), ps("q"), ps("P"), ps("D"), ps("Q"))
      }),
      "CatBoost" -> (() => new RidgeLagModel(
        math.min(tuned("CatBoost")("lag_features"), math.max(1, yTr.length - 1)))),
      "LSTM" -> (() => new RidgeLagModel(
        math.min(tuned("LSTM")("lookback"), math.max(1, yTr.length - 1)))))

    val scored = candidates.map { case (nm, mk) =>
      val score = try {
        val m = mk()
        m.fit(yTr, exTr)
        rmse(yTe, m.predict(yTe.length, exTe))
      } catch { case scala.util.control.NonFatal(_) => Double.MaxValue }
      (nm, mk, score)
    }
    leaderboard = scored.map(t => Entry(t._1, t._3)).sortBy(_.rmse)
    val best = scored.minBy(_._3)
    championRmse = best._3
    // The refit is guarded like candidate scoring: when every
    // candidate failed (all rmse = MaxValue — e.g. a tuner whose
    // trials all threw hands back an empty params map), minBy still
    // picks a failing constructor, and an uncaught throw here would
    // abort the WHOLE fleet job for one pathological series instead
    // of flagging it. A failed refit leaves champion = None;
    // forecast() then raises its documented "no champion" state,
    // which the per-key fleet wrapper reports as that key's failure.
    champion =
      try {
        val m = best._2()
        m.fit(y, exog) // refit on the full series (ref: trainer.py:548-570)
        Some(m)
      } catch { case scala.util.control.NonFatal(_) => None }
    leaderboard
  }

  def forecast(steps: Int, exog: Option[Array[Double]] = None): Forecast = {
    val m = champion.getOrElse(throw new IllegalStateException("no champion"))
    val preds = m.predict(steps, exog)
    val ci = 1.96 * championRmse
    Forecast(
      preds,
      preds.map(v => math.max(0.0, v - ci)), // floor 0 (ref: pages/4:322-324)
      preds.map(_ + ci),
      m.name, championRmse)
  }
}

object Tuner {
  /** Map-like accessor so trainModels can take either Trial params or a
    * plain map.
    */
  type ParamsLike = Map[String, Int]
}
