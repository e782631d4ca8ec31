package graft.ml

/** M1 — the model contract (ref: core/engine/models.py:24-76
  * `BaseModel`): fit on a monthly count series (+ optional exogenous
  * sales), predict `steps` months ahead. Implementations are plain
  * Scala so thousands of per-key instances can be fitted INSIDE
  * `mapGroups` on executors — the 100 TB parallelism is across series,
  * not within one fit (SURVEY.md §3.3).
  */
trait ForecastModel extends Serializable {
  def name: String
  def fit(y: Array[Double], exog: Option[Array[Double]]): Unit
  def predict(steps: Int, exog: Option[Array[Double]]): Array[Double]
  var isFitted: Boolean = false
}

object ForecastModel {
  /** Test RMSE, the universal objective (ref: trainer.py objective). */
  def rmse(actual: Array[Double], predicted: Array[Double]): Double = {
    require(actual.length == predicted.length && actual.nonEmpty)
    math.sqrt(actual.zip(predicted).map { case (a, p) =>
      val e = a - p; e * e
    }.sum / actual.length)
  }

  /** M5 — time-ordered split, last `testMonths` = test
    * (ref: trainer.py:165-197; never a random split).
    */
  def timeSplit(y: Array[Double], testMonths: Int = 3)
      : (Array[Double], Array[Double]) = {
    val idx = math.max(0, y.length - testMonths)
    (y.take(idx), y.drop(idx))
  }
}

/** Small dense linear algebra for the local models: solves
  * (AᵀA + λI) x = Aᵀb by Gaussian elimination with partial pivoting.
  */
object LinAlg {
  def solveNormal(rows: Array[Array[Double]], b: Array[Double],
      ridge: Double = 1e-8): Array[Double] = {
    val n = rows.head.length
    val ata = Array.ofDim[Double](n, n)
    val atb = Array.ofDim[Double](n)
    var r = 0
    while (r < rows.length) {
      val row = rows(r)
      var i = 0
      while (i < n) {
        atb(i) += row(i) * b(r)
        var j = 0
        while (j < n) { ata(i)(j) += row(i) * row(j); j += 1 }
        i += 1
      }
      r += 1
    }
    var d = 0
    while (d < n) { ata(d)(d) += ridge; d += 1 }
    // gaussian elimination with partial pivoting
    val m = ata.map(_.clone())
    val y = atb.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var best = math.abs(m(col)(col))
      var r2 = col + 1
      while (r2 < n) {
        if (math.abs(m(r2)(col)) > best) { best = math.abs(m(r2)(col)); piv = r2 }
        r2 += 1
      }
      if (piv != col) {
        val t = m(col); m(col) = m(piv); m(piv) = t
        val ty = y(col); y(col) = y(piv); y(piv) = ty
      }
      val p = m(col)(col)
      if (math.abs(p) > 1e-12) {
        var r3 = col + 1
        while (r3 < n) {
          val f = m(r3)(col) / p
          var c = col
          while (c < n) { m(r3)(c) -= f * m(col)(c); c += 1 }
          y(r3) -= f * y(col)
          r3 += 1
        }
      }
      col += 1
    }
    val x = Array.ofDim[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = y(i)
      var j = i + 1
      while (j < n) { s -= m(i)(j) * x(j); j += 1 }
      x(i) = if (math.abs(m(i)(i)) > 1e-12) s / m(i)(i) else 0.0
      i -= 1
    }
    x
  }
}
