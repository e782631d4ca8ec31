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

  test("uploadBatch maintains hub and mart end-to-end across a key move") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Files.createTempDirectory("engineup").toString
    val mart = s"$base/mart"
    val engine = new ClaimAnalysisEngine(spark,
      s"$base/hub", s"$base/sales", s"$base/models", s"$base/series")

    val prepared = engine.processClaimData(
      getClass.getResource("/claims_fixture.csv").getPath)
    // First upload: no hub, no mart → full build.
    assert(!engine.uploadBatch(prepared, LocalDate.of(2024, 2, 1), mart))
    assert(spark.read.parquet(mart).count() == 2)

    // Second upload re-files C003 under PLANT_B (same receipt date, so
    // the global spine holds): the incremental path must run and BOTH
    // documents — the one the claim left and the one it joined — must
    // match a from-scratch rebuild of the merged hub.
    val move = graft.claims.ClaimsEtl.preprocess(
      graft.claims.ClaimsEtl.canonicalize54(
        graft.claims.ClaimsEtl.withIngestSeq(Seq(
          ("C003", "2023", "11", "15", "PLANT_B", "CAT2_Y", "MAJOR_S"))
          .toDF("상담번호", "접수년", "접수월", "접수일", "플랜트",
            "제품범주2", "대분류"))))
    assert(engine.uploadBatch(move, LocalDate.of(2024, 3, 1), mart))
    val hub = engine.loadHub()
    assert(hub.filter(col("상담번호") === "C003")
      .select("플랜트").collect()(0).getString(0) == "PLANT_B",
      "the hub upsert keeps the batch's version of the moved claim")
    val docs = spark.read.parquet(mart).drop("key_bucket")
      .toJSON.collect().toSet
    val full = graft.claims.SeriesMart.build(hub, "2024-03-01")
      .toJSON.collect().toSet
    assert(docs == full,
      "the incremental mart equals a full rebuild of the merged hub")

    // A write AROUND the flow leaves the counts stale; the maintenance
    // verb re-derives them and the next upload is incremental again.
    engine.upsertHub(graft.claims.ClaimsEtl.preprocess(
      graft.claims.ClaimsEtl.canonicalize54(
        graft.claims.ClaimsEtl.withIngestSeq(Seq(
          ("C905", "2023", "10", "3", "PLANT_A", "CAT2_X", "MAJOR_P"))
          .toDF("상담번호", "접수년", "접수월", "접수일", "플랜트",
            "제품범주2", "대분류")))))
    engine.rebuildSeriesCounts(mart)
    val countsDir = graft.claims.SeriesCounts.dirFor(mart)
    val stored = graft.claims.SeriesCounts.read(spark, countsDir)
      .agg(sum("n_all")).collect()(0).getLong(0)
    assert(stored == engine.loadHub().count(),
      "rebuilt counts cover every hub row")
  }
}
