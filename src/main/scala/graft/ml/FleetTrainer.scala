package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB training path (SURVEY.md §3.3): per-series model fitting
  * is tiny (≤ a few hundred monthly points) — the parallelism is ACROSS
  * the thousands-to-millions of (plant, 대분류) series. One shuffle
  * assembles each key's zero-filled monthly series; tuning + champion
  * selection + forecasting then run INSIDE the executors via a UDF over
  * the bounded series arrays. No MLlib estimator fits on the driver, no
  * collect of raw data.
  */
object FleetTrainer {

  final case class FleetResult(
      champion: String, rmse: Double,
      forecast: Array[Double], lower: Array[Double], upper: Array[Double])

  private def trainOne(counts: Seq[Double], steps: Int, nTrials: Int)
      : FleetResult =
    // Per-key guard: one pathological series (every candidate AND the
    // champion refit failing) must flag ITS key, not throw out of the
    // UDF and abort the whole fleet job — the reference's per-key loop
    // records failures and moves on.
    try {
      val y = counts.toArray
      val tuner = new Tuner(testMonths = 3, nTrials = nTrials)
      val tuned = tuner.tuneAll(y).map { case (k, t) => k -> t.params }
      val sel = new ChampionSelector(testMonths = 3)
      sel.trainModels(y, None, tuned)
      val f = sel.forecast(steps)
      FleetResult(f.champion, f.testRmse, f.predictions, f.lower, f.upper)
    } catch {
      case scala.util.control.NonFatal(_) =>
        FleetResult("failed", Double.NaN,
          Array.fill(steps)(Double.NaN), Array.fill(steps)(Double.NaN),
          Array.fill(steps)(Double.NaN))
    }

  /** @param monthly zero-filled monthly counts: keyCols + ym + n.
    *                Series shorter than `minMonths` are skipped
    *                (ref: pages/4:72-73 — 12-month floor).
    */
  def trainAll(monthly: DataFrame, keyCols: Seq[String],
      steps: Int = 3, nTrials: Int = 10, minMonths: Int = 12): DataFrame = {
    val fitUdf = udf { counts: Seq[Double] => trainOne(counts, steps, nTrials) }
    monthly
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("ym"), col("n")))).as("series"))
      .filter(size(col("series")) >= minMonths)
      .withColumn("counts",
        transform(col("series"), s => s.getField("n").cast("double")))
      .withColumn("r", fitUdf(col("counts")))
      .select(keyCols.map(col) ++ Seq(
        col("r.champion").as("champion"),
        round(col("r.rmse"), 4).as("test_rmse"),
        col("r.forecast").as("forecast"),
        col("r.lower").as("ci_lower"),
        col("r.upper").as("ci_upper")): _*)
  }
}
