package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.SparkSession

/** M3 — the CatBoost slot as an MLlib gradient-boosted-tree regressor
  * on lag features t−1..t−k (+ optional sales exog), with recursive
  * multi-step rollout feeding predictions back as lags
  * (ref: core/engine/models.py:180-303). Driver-side API parity path;
  * the distributed fleet uses the local RidgeLagModel in this slot
  * (an MLlib fit cannot nest inside executors).
  */
final class GbtLagModel(spark: SparkSession, val lagFeatures: Int,
    val iterations: Int) extends ForecastModel {

  override def name: String = "CatBoost"

  private var model: GBTRegressionModel = _
  private var trainTail: Array[Double] = _
  private var lastExog: Double = 0.0
  private var usedExog = false

  override def fit(y: Array[Double], exog: Option[Array[Double]]): Unit = {
    import spark.implicits._
    require(y.length > lagFeatures, s"need > $lagFeatures points")
    usedExog = exog.isDefined
    val rows = (lagFeatures until y.length).map { t =>
      val lags = (1 to lagFeatures).map(i => y(t - i))
      val ex = exog.map(e => Seq(e(t))).getOrElse(Seq.empty)
      (y(t), lags ++ ex)
    }
    val df = rows.map { case (label, fs) => (label, fs.toArray) }
      .toDF("label", "raw")
      .selectExpr("label", s"raw")
    val dim = lagFeatures + (if (usedExog) 1 else 0)
    val withCols = (0 until dim).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"f$i", org.apache.spark.sql.functions.col("raw").getItem(i))
    }
    val assembled = new VectorAssembler()
      .setInputCols((0 until dim).map(i => s"f$i").toArray)
      .setOutputCol("features")
      .transform(withCols)
    model = new GBTRegressor()
      .setMaxIter(math.max(1, iterations / 50)) // scaled-down tree count
      .setMaxDepth(5)
      .setSeed(42L)
      .fit(assembled)
    trainTail = y.takeRight(lagFeatures)
    lastExog = exog.map(_.last).getOrElse(0.0)
    isFitted = true
  }

  override def predict(steps: Int, exog: Option[Array[Double]]): Array[Double] = {
    require(isFitted)
    val window = scala.collection.mutable.ArrayBuffer(trainTail: _*)
    (0 until steps).map { h =>
      val lags = (1 to lagFeatures).map(i => window(window.length - i))
      val ex =
        if (usedExog)
          Seq(exog.map(e => e(math.min(h, e.length - 1))).getOrElse(lastExog))
        else Seq.empty
      val v = model.predict(
        org.apache.spark.ml.linalg.Vectors.dense((lags ++ ex).toArray))
      window += v
      v
    }.toArray
  }
}
