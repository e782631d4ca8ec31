package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ForecastSpec extends AnyFunSuite {

  import ForecastModel._

  private def seasonalSeries(n: Int): Array[Double] =
    Array.tabulate(n)(t =>
      math.max(0, 10 + 4 * math.sin(2 * math.Pi * t / 12) + 0.1 * t +
        (if (t % 7 == 0) 1 else 0)))

  test("time split keeps order, last 3 test") {
    val (tr, te) = timeSplit(Array(1.0, 2, 3, 4, 5, 6), 3)
    assert(tr.toSeq == Seq(1.0, 2, 3) && te.toSeq == Seq(4.0, 5, 6))
  }

  test("seasonal naive repeats last year") {
    val m = new SeasonalNaiveModel()
    val y = (1 to 24).map(_.toDouble).toArray
    m.fit(y, None)
    assert(m.predict(3, None).toSeq == Seq(13.0, 14.0, 15.0))
  }

  test("ArimaLite with differencing beats naive on trending series") {
    val y = Array.tabulate(36)(t => 5.0 + 2.0 * t) // pure trend
    val (tr, te) = timeSplit(y)
    val arima = new ArimaLiteModel(1, 1, 0, 0, 0, 0)
    arima.fit(tr, None)
    val e = rmse(te, arima.predict(3, None))
    assert(e < 1.0, s"trend rmse $e")
  }

  test("RidgeLag model learns autoregression and clamps at zero") {
    val y = seasonalSeries(48)
    val m = new RidgeLagModel(12)
    m.fit(y, None)
    val preds = m.predict(6, None)
    assert(preds.forall(_ >= 0))
    assert(preds.forall(v => v < 50), "rollout stays bounded")
  }

  test("tuner + champion selection picks the lowest-RMSE model") {
    val y = seasonalSeries(48)
    val tuner = new Tuner(nTrials = 10)
    val tuned = tuner.tuneAll(y).map { case (k, t) => k -> t.params }
    val sel = new ChampionSelector()
    val lb = sel.trainModels(y, None, tuned)
    assert(lb.size == 3)
    assert(lb.head.rmse <= lb.last.rmse)
    val f = sel.forecast(3)
    assert(f.predictions.length == 3)
    assert(f.lower.zip(f.predictions).forall { case (lo, p) => lo <= p })
    assert(f.lower.forall(_ >= 0)) // CI floor 0
    assert(f.upper.zip(f.predictions).forall { case (hi, p) => hi >= p })
  }

  test("a fully-failing series flags its key instead of crashing the fleet") {
    // Every candidate constructor throws (empty tuned params), so all
    // scores are MaxValue and the champion REFIT fails too — before
    // round 9 that threw out of trainModels and would abort the whole
    // fleet job for one pathological series.
    val y = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val sel = new ChampionSelector(testMonths = 3)
    val lb = sel.trainModels(y, None, Map.empty)
    assert(lb.size == 3 && lb.forall(_.rmse == Double.MaxValue))
    assert(sel.champion.isEmpty, "a failed refit must not install a champion")
    intercept[IllegalStateException] { sel.forecast(3) }
    // and through the distributed fleet wrapper the key comes back
    // flagged, not exploded: a constant-zero 12-month series drives
    // every model fit toward degenerate fits but must yield a row.
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val monthly = (1 to 12).map(m => ("K", f"2024-$m%02d", 0L))
      .toDF("k", "ym", "n")
    val out = FleetTrainer.trainAll(monthly, Seq("k"), steps = 2,
      nTrials = 2, minMonths = 12)
    assert(out.count() == 1)
  }

  test("arima trained with exog refuses predict without exog") {
    val y = seasonalSeries(30)
    val exog = Array.tabulate(30)(t => 100.0 + t)
    val m = new ArimaLiteModel(1, 0, 0, 0, 0, 0)
    m.fit(y, Some(exog))
    intercept[IllegalArgumentException] { m.predict(3, None) }
  }

  test("model store round-trips a champion") {
    val y = seasonalSeries(30)
    val m = new SeasonalNaiveModel()
    m.fit(y, None)
    val dir = java.nio.file.Files.createTempDirectory("models").toString
    ModelStore.saveChampion(dir, "PLANT_A", "MAJOR_P", m, 1.5)
    val back = ModelStore.loadChampion(dir, "PLANT_A", "MAJOR_P")
    assert(back.isDefined)
    assert(back.get.predict(2, None).toSeq == m.predict(2, None).toSeq)
    assert(ModelStore.loadChampion(dir, "NOPE", "X").isEmpty)
  }

  test("fleet trainer fits per-key series distributed") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val rows = for {
      key <- Seq("A", "B")
      t <- 0 until 24
    } yield (key, f"${2022 + t / 12}-${t % 12 + 1}%02d", 5.0 + t % 12)
    val monthly = rows.toDF("k", "ym", "n")
    val out = FleetTrainer.trainAll(monthly, Seq("k"), steps = 2, nTrials = 3)
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(Seq("SARIMAX", "CatBoost", "LSTM").contains(r.getAs[String]("champion")))
      assert(r.getAs[scala.collection.Seq[Double]]("forecast").length == 2)
    }
  }

  test("seasonal allocation splits totals by same-month share") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val history = Seq(
      (2023, 8, "S1", 8.0), (2023, 8, "S2", 2.0),
      (2024, 8, "S1", 6.0), (2024, 8, "S2", 4.0),
      (2024, 1, "S1", 5.0))
      .toDF("접수년", "접수월", "소분류", "건수")
    val out = SeasonalAllocation.allocate(spark, "P", "M",
      history, Seq((8, 100.0), (9, 50.0))).collect()
    val aug = out.filter(_.getAs[Int]("접수월") == 8)
      .map(r => r.getAs[String]("소분류") -> r.getAs[Double]("예측_건수")).toMap
    // month-8 mean: S1=(8+6)/2=7, S2=(2+4)/2=3 → shares .7/.3
    assert(math.abs(aug("S1") - 70.0) < 1e-9)
    assert(math.abs(aug("S2") - 30.0) < 1e-9)
    // month 9 has no history → overall sum share S1=19/25, S2=6/25
    val sep = out.filter(_.getAs[Int]("접수월") == 9)
      .map(r => r.getAs[String]("소분류") -> r.getAs[Double]("예측_건수")).toMap
    assert(math.abs(sep("S1") - 50.0 * 19 / 25) < 1e-9)
    assert(math.abs(sep("S2") - 50.0 * 6 / 25) < 1e-9)
  }
}
