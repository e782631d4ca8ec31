package graft.claims

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PlantSettingsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val hub = ClaimsEtl.ingestCsv(spark,
    getClass.getResource("/claims_fixture.csv").getPath)

  test("performance filter applies the canonical macros") {
    val filtered = PlantSettings.performanceFilter(hub)
    // fixture: C006 has 불만원인=기타 → excluded; others pass
    assert(filtered.count() == 5)
  }

  test("cascade options narrow by upstream selections") {
    val all = PlantSettings.cascadeOptions(hub, Seq.empty, "대분류")
    assert(all == Seq("MAJOR_P", "MAJOR_S"))
    val narrowed = PlantSettings.cascadeOptions(hub,
      Seq("사업부문" -> Seq("B2B식품")), "대분류")
    assert(narrowed == Seq("MAJOR_P")) // only C004 is B2B식품
  }

  test("plant settings JSON round-trips") {
    val json =
      """{"부산공장": {"filter_business": ["식품"], "filter_reason": ["제조불만"],
        |  "filter_grade": ["일반"], "filter_major_category": ["포장"],
        |  "saved_pivot_rows": ["중분류"]}}""".stripMargin
    val f = Files.createTempFile("settings", ".json")
    Files.write(f, json.getBytes("UTF-8"))
    val cfg = PlantSettings.load(spark, f.toString)
    assert(cfg.keySet == Set("부산공장"))
    assert(cfg("부산공장").filterBusiness == Seq("식품"))
    assert(cfg("부산공장").savedPivotRows == Seq("중분류"))
  }
}
