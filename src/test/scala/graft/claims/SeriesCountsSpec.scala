package graft.claims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The delta-bounded mart maintenance contract (round-11 headline):
  * the count store reproduces document assembly bit-for-bit, is
  * maintained by partition replacement from the upsert's affected set,
  * and heals every constructed crash state by replaying its journals.
  */
class SeriesCountsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def fixture: DataFrame = ClaimsEtl.ingestCsv(spark,
    getClass.getResource("/claims_fixture.csv").getPath)

  private def mkBatch(rows: Seq[(String, String, String, String, String,
      String, String)]): DataFrame = {
    import spark.implicits._
    ClaimsEtl.preprocess(ClaimsEtl.canonicalize54(
      ClaimsEtl.withIngestSeq(rows
        .toDF("상담번호", "접수년", "접수월", "접수일", "플랜트",
          "제품범주2", "대분류"))))
  }

  private def docs(df: DataFrame): Set[String] = df.toJSON.collect().toSet

  test("buildFromCounts(aggregate(hub)) is bit-identical to build(hub)") {
    val hub = fixture
    assert(docs(SeriesMart.buildFromCounts(SeriesCounts.aggregate(hub),
      "2024-02-01")) == docs(SeriesMart.build(hub, "2024-02-01")))
  }

  test("count-path assembly survives null keys, undated rows, separator collisions") {
    import spark.implicits._
    // The hostile shapes the lossy concat key and null-safe joins
    // exist for: null parent/child components, a component containing
    // the "_" separator, an all-undated key (zero history, lag only),
    // and an invalid-lag row.
    val hostile = Seq(
      (null, "C_1", "M", "S1", "2023-10-05", true, 4),
      (null, "C_1", "M", null, "2023-11-05", false, -2),
      ("P_A", "C", "1_M", "S2", "2023-10-20", true, 7),
      ("P_A", "C", "1_M", "S2", null, false, 0),
      ("UND", "X", "Y", "S3", null, true, 11))
      .toDF("플랜트", "제품범주2", "대분류", "중분류", "접수일자",
        "Lag_Valid", "Lag_Days")
      .withColumn("접수일자", to_date(col("접수일자")))
      .withColumn("접수년", year(col("접수일자")))
      .withColumn("접수월", month(col("접수일자")))
    assert(docs(SeriesMart.buildFromCounts(SeriesCounts.aggregate(hostile),
      "2024-01-01")) == docs(SeriesMart.build(hostile, "2024-01-01")))
  }

  /** Counts ground truth = one fresh aggregation of the current hub. */
  private def assertCountsCurrent(countsDir: String, hub: DataFrame): Unit = {
    val stored = SeriesCounts.read(spark, countsDir)
      .select(SeriesCounts.grainCols.map(col) ++
        Seq(col("ym"), col("n_all"), col("n_valid"), col("sum_lag")) ++
        ClaimsSchema.partitionCols.map(c => col(c).cast("int")): _*)
    val expect = SeriesCounts.aggregate(hub)
      .select(stored.columns.map(col): _*)
    assert(stored.exceptAll(expect).isEmpty && expect.exceptAll(stored).isEmpty,
      "count store must equal a fresh aggregation of the hub")
  }

  test("upload flow maintains counts by partition replacement, not rebuilds") {
    val base = java.nio.file.Files.createTempDirectory("cnt1").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    val countsDir = SeriesCounts.dirFor(martDir)
    assert(!UploadFlow.run(spark, fixture, hubPath, martDir, "2024-02-01"))
    assertCountsCurrent(countsDir, HubStore.read(spark, hubPath))

    // Same-spine batch touching one month: only that count partition's
    // files may change.
    def listing(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(countsDir))
        .map(f => f.getPath.stripPrefix(countsDir) ->
          (f.lastModified(), f.length())).toMap
    }
    val before = listing()
    Thread.sleep(1100) // mtime resolution guard
    val batch = mkBatch(Seq(
      ("C900", "2023", "11", "5", "PLANT_A", "CAT2_X", "MAJOR_P")))
    assert(UploadFlow.run(spark, batch, hubPath, martDir, "2024-03-01"))
    assertCountsCurrent(countsDir, HubStore.read(spark, hubPath))
    val after = listing()
    val changed = after.keySet.union(before.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed.nonEmpty && changed.forall(_.contains("접수년=2023")) &&
      changed.forall(_.contains("접수월=11")),
      s"only the touched month's count partition may change, got: $changed")
    assert((before.keySet -- changed).nonEmpty,
      "untouched count partitions keep their bytes")
    // The journals are consumed.
    assert(!new java.io.File(countsDir).listFiles()
      .exists(_.getName.startsWith(SeriesCounts.pendingPartsFile)))
  }

  test("a crash between hub commit and count replacement heals by journal replay") {
    val base = java.nio.file.Files.createTempDirectory("cnt2").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    val countsDir = SeriesCounts.dirFor(martDir)
    assert(!UploadFlow.run(spark, fixture, hubPath, martDir, "2024-02-01"))

    // The crashed attempt: the real flow's steps up to and including
    // the hub commit (count-partition journal written by the upsert's
    // onAffected hook), death before applyPending. C003 moves from
    // PLANT_A (2023-11) to a NEW month partition (2023-12) so both the
    // vacated and the gained partition are journaled.
    val batch = mkBatch(Seq(
      ("C003", "2023", "12", "15", "PLANT_B", "CAT2_Y", "MAJOR_S")))
    SeriesMart.journalTouchedKeys(spark, martDir,
      SeriesMart.priorParentKeys(HubStore.read(spark, hubPath), batch))
    HubStore.upsert(spark, batch, hubPath,
      onAffected = p => SeriesCounts.journalParts(spark, countsDir, p))
    assert(new java.io.File(countsDir).listFiles()
      .exists(_.getName.startsWith(SeriesCounts.pendingPartsFile)),
      "the affected partitions are journaled before the crash point")

    // The retry is the REAL flow end-to-end with the same batch: its
    // applyPending must replay the crashed generation (its own probe
    // against the merged hub can no longer see the vacated month).
    assert(UploadFlow.run(spark, batch, hubPath, martDir, "2024-03-01"))
    val hub = HubStore.read(spark, hubPath)
    assertCountsCurrent(countsDir, hub)
    assert(docs(spark.read.parquet(martDir).drop("key_bucket")) ==
      docs(SeriesMart.build(hub, "2024-03-01")),
      "the healed flow leaves the mart equal to a full rebuild")
  }

  test("a month the hub vacates loses its count partition (journaled delete)") {
    val base = java.nio.file.Files.createTempDirectory("cnt3").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    val countsDir = SeriesCounts.dirFor(martDir)
    assert(!UploadFlow.run(spark, fixture, hubPath, martDir, "2024-02-01"))
    assert(new java.io.File(s"$countsDir/접수년=2023/접수월=11").exists)
    // Both 2023-11 claims re-dated into 2023-10: the 11 partition
    // vacates in the hub AND must vacate in the counts.
    val batch = mkBatch(Seq(
      ("C003", "2023", "10", "15", "PLANT_A", "CAT2_X", "MAJOR_P"),
      ("C004", "2023", "10", "16", "PLANT_A", "CAT2_X", "MAJOR_P")))
    UploadFlow.run(spark, batch, hubPath, martDir, "2024-03-01")
    val hub = HubStore.read(spark, hubPath)
    assertCountsCurrent(countsDir, hub)
    assert(!new java.io.File(s"$countsDir/접수년=2023/접수월=11").exists,
      "the vacated month's count partition must be deleted, not ghosted")
  }

  test("an invalid (meta-less) store rebuilds wholesale and self-heals") {
    val base = java.nio.file.Files.createTempDirectory("cnt4").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    val countsDir = SeriesCounts.dirFor(martDir)
    // Migration shape: a hub that predates the count store.
    HubStore.upsert(spark, fixture, hubPath)
    assert(!SeriesCounts.isValid(spark, countsDir))
    val batch = mkBatch(Seq(
      ("C900", "2023", "11", "5", "PLANT_A", "CAT2_X", "MAJOR_P")))
    assert(!UploadFlow.run(spark, batch, hubPath, martDir, "2024-03-01"),
      "first mart build over a migrated hub is the full-rebuild path")
    assert(SeriesCounts.isValid(spark, countsDir))
    val hub = HubStore.read(spark, hubPath)
    assertCountsCurrent(countsDir, hub)
    assert(docs(spark.read.parquet(martDir).drop("key_bucket")) ==
      docs(SeriesMart.build(hub, "2024-03-01")))
  }

  test("upload flow over a bucketed hub matches the flat-layout flow") {
    // The round-11 bucketed hub layout must be transparent to the
    // whole maintenance pipeline: same batches, same mart documents,
    // same counts — with the upsert's three-level affected tuples
    // truncated to the count store's month grain.
    val base = java.nio.file.Files.createTempDirectory("cntbkt").toString
    val batch = mkBatch(Seq(
      ("C003", "2023", "12", "15", "PLANT_B", "CAT2_Y", "MAJOR_S"),
      ("C950", "2023", "10", "2", "PLANT_A", "CAT2_X", "MAJOR_P")))
    HubStore.write(fixture, s"$base/hubF")
    HubStore.writeBucketedHub(fixture, s"$base/hubB", buckets = 4)
    assert(UploadFlow.run(spark, batch, s"$base/hubF", s"$base/martF",
      "2024-03-01") ==
      UploadFlow.run(spark, batch, s"$base/hubB", s"$base/martB",
        "2024-03-01"))
    assert(docs(spark.read.parquet(s"$base/martF").drop("key_bucket")) ==
      docs(spark.read.parquet(s"$base/martB").drop("key_bucket")),
      "bucketed- and flat-hub flows must produce identical marts")
    assertCountsCurrent(SeriesCounts.dirFor(s"$base/martB"),
      HubStore.read(spark, s"$base/hubB"))
  }

  test("a spine-extending batch rebuilds every doc from counts, hub untouched") {
    val base = java.nio.file.Files.createTempDirectory("cnt5").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    assert(!UploadFlow.run(spark, fixture, hubPath, martDir, "2024-02-01"))
    // 2024-05 extends the global spine — the old design's O(hub+mart)
    // full rebuild, now assembled from count rows. Semantics pinned:
    // still returns false (every doc rebuilt + re-stamped), histories
    // all span through the new month, and the result equals the
    // from-hub rebuild exactly.
    val batch = mkBatch(Seq(
      ("C901", "2024", "5", "2", "PLANT_A", "CAT2_X", "MAJOR_P")))
    assert(!UploadFlow.run(spark, batch, hubPath, martDir, "2024-06-01"),
      "spine extension reports the full-rebuild (re-stamp) path")
    val hub = HubStore.read(spark, hubPath)
    assert(docs(spark.read.parquet(martDir).drop("key_bucket")) ==
      docs(SeriesMart.build(hub, "2024-06-01")))
    assert(spark.read.parquet(martDir)
      .select(element_at(col("data.history"), -1).getField("date").as("d"))
      .collect().forall(_.getString(0) == "2024-05"))
    // The NEXT same-spine upload is incremental again.
    val batch2 = mkBatch(Seq(
      ("C902", "2024", "5", "9", "PLANT_B", "CAT2_Y", "MAJOR_S")))
    assert(UploadFlow.run(spark, batch2, hubPath, martDir, "2024-06-02"))
    assert(docs(spark.read.parquet(martDir).drop("key_bucket")
      .filter(col("key") === "PLANT_B_CAT2_Y_MAJOR_S")) ==
      docs(SeriesMart.build(HubStore.read(spark, hubPath), "2024-06-02")
        .filter(col("key") === "PLANT_B_CAT2_Y_MAJOR_S")))
  }
}
