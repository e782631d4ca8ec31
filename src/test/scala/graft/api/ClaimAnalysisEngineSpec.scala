package graft.api

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end facade flow on the fixture: ingest → hub → mart → risk
  * scan → lag stats (SURVEY.md §7.3 minimum slice through the facade).
  */
class ClaimAnalysisEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("full pipeline: ingest → hub → series mart → risk scan") {
    val base = Files.createTempDirectory("engine").toString
    val engine = new ClaimAnalysisEngine(spark,
      s"$base/hub", s"$base/sales", s"$base/models", s"$base/series")

    val prepared = engine.processClaimData(
      getClass.getResource("/claims_fixture.csv").getPath)
    engine.upsertHub(prepared)

    assert(engine.loadHub().count() == 6)
    assert(engine.availablePeriods().count() == 3) // 2023-10, 2023-11, 2024-01

    assert(engine.generateNestedSeries(LocalDate.of(2024, 2, 1)) == 2)
    assert(spark.read.json(s"$base/series").count() == 2)

    val risks = engine.scanRisks(LocalDate.of(2030, 1, 1))
    // every scored key has the full report shape
    assert(risks.columns.toSet.intersect(
      Set("score", "status", "reason", "trend")).size == 4)

    val lag = engine.lagStats().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lag("PLANT_A") == 3) // C001, C002, C003 valid lags
  }
}
