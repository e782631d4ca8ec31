package graft.api

import java.nio.file.Files
import java.time.LocalDate

import graft.claims._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Claims pipeline at volume: the sf0.1 orders table (~1.5M rows)
  * mapped onto the claims schema and pushed through canonicalize →
  * preprocess → hub upsert → partition catalog → series mart → risk
  * scan. Verifies the domain engine's shapes hold beyond fixture size
  * (SURVEY.md §3.1 end-to-end, driver-scale inputs).
  */
class ClaimsScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("orders-derived claims flow end-to-end at sf0.1 volume") {
    val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val claims = orders.select(
      col("o_orderkey").cast("string").as("상담번호"),
      year(col("o_orderdate")).cast("string").as("접수년"),
      month(col("o_orderdate")).cast("string").as("접수월"),
      dayofmonth(col("o_orderdate")).cast("string").as("접수일"),
      concat(lit("PLANT_"), (col("o_custkey") % 5).cast("string")).as("플랜트"),
      col("o_orderpriority").as("대분류"),
      col("o_orderstatus").as("중분류"),
      concat(lit("CAT_"), (col("o_orderkey") % 3).cast("string")).as("제품범주2"),
      when(col("o_totalprice") > 200000, "중대").otherwise("일반").as("등급기준"),
      date_format(date_sub(col("o_orderdate"), (col("o_orderkey") % 40).cast("int")),
        "yyyy-MM-dd").as("제조일자"))

    val t0 = System.nanoTime()
    val prepared = ClaimsEtl.preprocess(
      ClaimsEtl.canonicalize54(ClaimsEtl.withIngestSeq(claims)))

    val base = Files.createTempDirectory("scale").toString
    HubStore.write(prepared, s"$base/hub")
    val hub = HubStore.read(spark, s"$base/hub")
    val n = hub.count()
    assert(n == orders.count()) // unique keys, nothing dropped

    // partition catalog covers the full order date range
    val cat = HubStore.catalog(spark, s"$base/hub").collect()
    assert(cat.length > 70) // ~80 year-months in 1995..2001
    assert(cat.map(_.getAs[Long]("건수")).sum == n)

    // mart: one doc per (플랜트, 제품범주2, 대분류) = 5×3×5
    val mart = SeriesMart.build(hub, "2026-01-01")
    assert(mart.count() == 75)

    // risk scan over the full hub
    val risks = RiskScanJob.scan(hub,
      Seq("플랜트", "대분류", "등급기준"), ClaimsSchema.receiptDateCol,
      Some("등급기준"), LocalDate.of(2030, 1, 1))
    val scanned = risks.count()
    assert(scanned == 50) // 5 plants × 5 priorities × 2 grades
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"end-to-end claims pipeline on ${n} rows: $secs%.1f s")
    assert(secs < 300, s"pipeline too slow: $secs s")
  }
}
