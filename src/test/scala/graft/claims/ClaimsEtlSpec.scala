package graft.claims

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ETL semantics vs the reference pipeline (ref: core/etl.py; fixture
  * extends data/dummy_claims.csv per FIXTURES.md §1: negative-lag row,
  * duplicate key keep-last, garbage dates, null-key row, month gap).
  */
class ClaimsEtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def fixturePath: String =
    getClass.getResource("/claims_fixture.csv").getPath

  private lazy val processed =
    ClaimsEtl.ingestCsv(spark, fixturePath).cache()

  test("canonicalize yields exactly 54 data columns") {
    val canon = ClaimsEtl.canonicalize54(ClaimsEtl.loadCsv(spark, fixturePath))
    assert(canon.columns.filterNot(_ == ClaimsSchema.ingestSeqCol).length == 54)
    // missing columns present as nulls
    assert(canon.select("접수경로").distinct().collect().map(_.get(0)).toSeq == Seq(null))
  }

  test("null-key row dropped; duplicate key keeps last uploaded row") {
    val rows = processed.select("상담번호", "등급기준").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 6)
    assert(!rows.contains(null))
    assert(rows("C005") == "사고") // later row wins (keep='last')
  }

  test("multi-format date parse with null on failure") {
    val m = processed.select("상담번호", "제조일자").collect()
      .map(r => r.getString(0) -> Option(r.getDate(1)).map(_.toString)).toMap
    assert(m("C001").contains("2023-10-01")) // yyyy-MM-dd
    assert(m("C002").contains("2023-10-02")) // yyyy/MM/dd
    assert(m("C003").contains("2023-11-01")) // yyyy.MM.dd
    assert(m("C006").isEmpty)                // garbage → null
  }

  test("epoch-ms and datetime-formatted 제조일자 survive preprocess") {
    import spark.implicits._
    // Round-9 review: cleanMfgDate existed only as the F10 entry, so a
    // manufacture date uploaded as epoch-ms nulled out at ETL time and
    // an Xlsx datetime string ('yyyy-MM-dd HH:mm:ss') matched no
    // parse pattern.
    val raw = ClaimsEtl.canonicalize54(Seq(
      ("E001", "2024", "1", "5", "1696118400000"),        // 2023-10-01 UTC
      ("E002", "2024", "1", "6", "2023-10-02 12:30:00"),
      ("E003", "2024", "1", "7", "2023/10/03 00:00:01"),
      ("E004", "2024", "1", "8", "definitely-not-a-date"))
      .toDF("상담번호", "접수년", "접수월", "접수일", "제조일자"))
    val m = ClaimsEtl.preprocess(raw).select("상담번호", "제조일자")
      .collect()
      .map(r => r.getString(0) -> Option(r.getDate(1)).map(_.toString))
      .toMap
    assert(m("E001").contains("2023-10-01"))
    assert(m("E002").contains("2023-10-02"))
    assert(m("E003").contains("2023-10-03"))
    assert(m("E004").isEmpty)
  }

  test("receipt date built from parts; lag derivation flags negatives") {
    val m = processed
      .select("상담번호", "접수일자", "Lag_Days", "Lag_Valid").collect()
      .map(r => r.getString(0) ->
        (Option(r.getDate(1)).map(_.toString),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          r.getBoolean(3))).toMap
    assert(m("C001") == (Some("2023-10-10"), Some(9), true))
    assert(m("C004") == (Some("2023-11-16"), Some(-4), false)) // negative lag kept, flagged
    assert(m("C006")._2.isEmpty && !m("C006")._3)              // null mfg → invalid
  }

  test("접수년/월 numeric after preprocess") {
    val r = processed.filter(col("상담번호") === "C005")
      .select("접수년", "접수월").collect()(0)
    assert(r.getInt(0) == 2024 && r.getInt(1) == 1)
  }

  test("quality report counts rows, duplicates and nulls") {
    val canon = ClaimsEtl.canonicalize54(ClaimsEtl.loadCsv(spark, fixturePath))
    val q = ClaimsEtl.validateQuality(canon)
    assert(q.totalRows == 8)
    assert(q.colsOk)
    assert(q.duplicateCount == 0) // full rows differ (C005 rows differ in grade)
    assert(q.nullCounts("상담번호") == 1)
    assert(q.nullCounts("접수경로") == 8)
  }

  test("raw-frame dedup precedes canonicalize (reference stage parity)") {
    // The reference drop_duplicates the RAW frame (etl.py:135) BEFORE
    // extract_54_fields (:139): rows equal on every canonical column
    // but differing in a later-dropped extra column are residual
    // duplicates it only REPORTS (validate_data_quality), never
    // collapses. Deduping the canonical frame first (the r9 ordering)
    // diverged these stage row counts.
    val p = java.nio.file.Files.createTempFile("claims", ".csv")
    java.nio.file.Files.write(p,
      ("상담번호,접수년,접수월,접수일,extra_column\n" +
        "X1,2024,1,5,a\n" +
        "X1,2024,1,5,b\n" + // same canonical row, different extra → kept
        "X1,2024,1,5,b\n"   // exact raw duplicate → collapsed
        ).getBytes("UTF-8"))
    val canon = ClaimsEtl.canonicalize54(
      ClaimsEtl.dropFullDuplicates(ClaimsEtl.loadCsv(spark, p.toString)))
    assert(canon.count() == 2,
      "raw dedup collapses exact raw dups only; extras-differ rows stay")
    assert(ClaimsEtl.validateQuality(canon).duplicateCount == 1,
      "the canonical-identical pair reports as a residual duplicate")
  }

  test("epoch-ms heuristic mfg-date clean") {
    import spark.implicits._
    val df = Seq("1697068800000", "2023-10-12", "junk").toDF("제조일자")
    val out = df.select(ClaimsEtl.cleanMfgDate(col("제조일자")).as("d"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString))
    assert(out(0).contains("2023-10-12")) // epoch ms > 1e12
    assert(out(1).contains("2023-10-12"))
    assert(out(2).isEmpty)
  }
}
