package graft.claims

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sales semantics from FIXTURES.md §3: estimation backfill from ≤3
  * prior months (non-cascading, zeros count), Smart Sync creating
  * missing claim months with 0, PPM formula.
  */
class SalesStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._
  private def salesDf(rows: Seq[(String, String, Int, Int, java.lang.Double, Boolean)]) = {
    import spark.implicits._
    rows.toDF("ID", "플랜트", "년", "월", "매출수량", "is_estimated")
  }

  test("estimation backfill: mean of prior months, zeros included, non-cascading") {
    val s = salesDf(Seq(
      ("a", "P1", 2024, 1, 100.0, false),
      ("a", "P1", 2024, 2, 200.0, false),
      ("a", "P1", 2024, 3, null, false),  // → mean(100,200) = 150, estimated
      ("a", "P1", 2024, 4, null, false),  // → mean(100,200) original only → wait: months 1,2,3 in range; 3 is null → mean(200, null→skip, 100? range -3..-1 = months 1..3) = 150
      ("a", "P1", 2024, 6, 0.0, false),   // priors 3,4,5: originals null,null,absent → no estimate
      ("b", "P2", 2024, 1, 0.0, false)    // no priors → stays 0, not estimated
    ))
    val out = SalesStore.withEstimation(s).collect()
      .map(r => (r.getAs[String]("플랜트"), r.getAs[Int]("월")) ->
        (Option(r.getAs[java.lang.Double]("매출수량")).map(_.toDouble),
          r.getAs[Boolean]("is_estimated"))).toMap
    assert(out(("P1", 3)) == (Some(150.0), true))
    assert(out(("P1", 4)) == (Some(150.0), true)) // original window 1..3 → (100,200)
    assert(out(("P1", 6)) == (Some(0.0), false))  // no original values in window
    assert(out(("P2", 1)) == (Some(0.0), false))
  }

  test("smart sync fills missing claim months with zero and latest plant ID") {
    import spark.implicits._
    val sales = salesDf(Seq(
      ("id9", "P1", 2024, 2, 500.0, false)))
    val keys = Seq(("P1", 2024, 2), ("P1", 2024, 3), ("P3", 2024, 1))
      .toDF("플랜트", "접수년", "접수월")
    val out = SalesStore.syncWithClaims(keys, sales).collect()
      .map(r => (r.getAs[String]("플랜트"), r.getAs[Int]("월")) ->
        (r.getAs[String]("ID"), r.getAs[Double]("매출수량"))).toMap
    assert(out(("P1", 2)) == ("id9", 500.0))
    assert(out(("P1", 3)) == ("id9", 0.0)) // created with latest plant id
    assert(out(("P3", 1)) == ("", 0.0))    // unknown plant → empty id
  }

  test("ppm = claims / sales * 1e6 with zero-guard") {
    import spark.implicits._
    val hub = Seq(
      ("P1", 2024, 2), ("P1", 2024, 2), ("P1", 2024, 3))
      .toDF("플랜트", "접수년", "접수월")
    val sales = salesDf(Seq(("a", "P1", 2024, 2, 1000000.0, false),
      ("a", "P1", 2024, 3, 0.0, false)))
    val out = SalesStore.ppm(hub, sales).collect()
      .map(r => r.getAs[Int]("월") ->
        Option(r.getAs[java.lang.Double]("PPM")).map(_.toDouble)).toMap
    assert(out(2).contains(2.0)) // 2 claims / 1M units * 1e6
    assert(out(3).isEmpty)       // zero sales → null PPM
  }

  test("long to pivot to long round-trips values") {
    val s = salesDf(Seq(
      ("a", "P1", 2024, 1, 10.0, false),
      ("a", "P1", 2024, 2, 20.0, false),
      ("b", "P2", 2024, 1, 30.0, false)))
    val wide = SalesStore.longToPivot(s)
    assert(wide.columns.toSet == Set("플랜트", "2024-01", "2024-02", "ID"))
    val long = SalesStore.pivotToLong(wide)
    val vals = long.collect().map(r =>
      (r.getAs[String]("플랜트"), r.getAs[Int]("월")) -> r.getAs[Double]("매출수량")).toMap
    assert(vals(("P1", 1)) == 10.0 && vals(("P1", 2)) == 20.0)
    assert(vals(("P2", 1)) == 30.0 && vals(("P2", 2)) == 0.0) // pivot zero-fill
  }
}
