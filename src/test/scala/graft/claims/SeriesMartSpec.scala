package graft.claims

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mart invariants from FIXTURES.md §4: zero-filled global month range,
  * history counts ALL rows while stats use Lag_Valid-only counts,
  * ddof=1 std, slope over last 3 months, filename sanitization.
  */
class SeriesMartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private lazy val mart = SeriesMart.build(
    ClaimsEtl.ingestCsv(spark,
      getClass.getResource("/claims_fixture.csv").getPath),
    asOf = "2024-02-01").cache()

  test("one doc per (플랜트, 제품범주2, 대분류) with zero-filled global spine") {
    val docs = mart.collect()
    assert(docs.length == 2) // PLANT_A and PLANT_B groups
    val keys = docs.map(_.getAs[String]("key")).toSet
    assert(keys == Set("PLANT_A_CAT2_X_MAJOR_P", "PLANT_B_CAT2_Y_MAJOR_S"))
    // global spine 2023-10 .. 2024-01 (4 months incl. the 2023-12 gap)
    docs.foreach { d =>
      val hist = d.getAs[Row]("data").getAs[scala.collection.Seq[Row]]("history")
      assert(hist.map(_.getAs[String]("date")) ==
        Seq("2023-10", "2023-11", "2023-12", "2024-01"))
    }
  }

  test("history counts all rows; stats use Lag_Valid-only counts") {
    val a = mart.filter(col("key") === "PLANT_A_CAT2_X_MAJOR_P").collect()(0)
    val hist = a.getAs[Row]("data").getAs[scala.collection.Seq[Row]]("history")
      .map(r => r.getAs[String]("date") -> r.getAs[Int]("count")).toMap
    // all 4 PLANT_A rows dated: 2 in Oct, 2 in Nov
    assert(hist == Map("2023-10" -> 2, "2023-11" -> 2, "2023-12" -> 0, "2024-01" -> 0))
    // C004 has invalid lag → valid counts are [2,1,0,0]
    val stats = a.getAs[Row]("meta").getAs[Row]("parent_stats")
    val validMean = stats.getAs[Double]("mean")
    assert(math.abs(validMean - 0.75) < 1e-9) // (2+1+0+0)/4
    // ddof=1 std of [2,1,0,0] = sqrt((1.25^2... compute: mean .75,
    // ss = (1.5625+0.0625+0.5625+0.5625)/3) = sqrt(2.75/3)
    assert(math.abs(stats.getAs[Double]("std") - math.sqrt(2.75 / 3)) < 1e-9)
    // slope over last 3 valid counts [1,0,0] = (0-1)/2
    assert(math.abs(stats.getAs[Double]("slope") - (-0.5)) < 1e-9)
    // avg lag over valid rows C001(9), C002(9), C003(14) = 32/3 → 10.7
    assert(math.abs(stats.getAs[Double]("avg_lag_days") - 10.7) < 1e-9)
  }

  test("children grouped by 중분류 with own stats") {
    val a = mart.filter(col("key") === "PLANT_A_CAT2_X_MAJOR_P").collect()(0)
    val children = a.getAs[scala.collection.Seq[Row]]("children")
    assert(children.map(_.getAs[String]("sub_key")) == Seq("MIDDLE_Q", "MIDDLE_R"))
    val q = children.head
    val qh = q.getAs[scala.collection.Seq[Row]]("history").map(_.getAs[Int]("count"))
    assert(qh == Seq(2, 0, 0, 0))
  }

  test("per-key file export sanitizes filenames") {
    import spark.implicits._
    val dirty = Seq(
      ("P/1", "C:2", "M*3", "S?", "2024-01-10", true, 1)
    ).toDF("플랜트", "제품범주2", "대분류", "중분류", "접수일자", "Lag_Valid", "Lag_Days")
      .withColumn("접수일자", to_date(col("접수일자")))
    val m = SeriesMart.build(dirty, "2024-02-01")
    val dir = java.nio.file.Files.createTempDirectory("mart").toString
    assert(SeriesMart.writePerKeyFiles(m, dir) == 1)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.toSeq == Seq("P-1_C-2_M-3.json"))
    val content = scala.io.Source.fromFile(s"$dir/${files.head}", "UTF-8").mkString
    assert(content.contains("\"key\":\"P/1_C:2_M*3\"")) // raw key preserved
    assert(!content.contains("filename_key"))
  }

  test("dataset sink round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("martds").toString
    SeriesMart.writeJsonDataset(mart, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("key", "meta", "data", "children"))
  }
}
