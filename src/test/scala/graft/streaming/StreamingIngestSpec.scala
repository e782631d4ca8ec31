package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("file-stream upload merges into the hub with upsert semantics") {
    val landing = Files.createTempDirectory("landing").toString
    val hub = Files.createTempDirectory("hub").toString + "/hub"
    val ckpt = Files.createTempDirectory("ckpt").toString

    val q = StreamingIngest.start(spark, landing, hub, ckpt)
    try {
      // batch 1: the fixture upload
      Files.copy(
        Paths.get(getClass.getResource("/claims_fixture.csv").getPath),
        Paths.get(landing, "upload1.csv"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      val after1 = spark.read.parquet(hub)
      assert(after1.count() == 6)

      // batch 2: re-upload C001 with a changed grade + a new claim
      val update =
        "상담번호,접수년,접수월,접수일,플랜트,등급기준\n" +
          "C001,2023,10,10,PLANT_A,중대\n" +
          "C100,2024,3,2,PLANT_B,일반\n"
      Files.write(Paths.get(landing, "upload2.csv"),
        update.getBytes("UTF-8"))
      q.processAllAvailable()

      val after2 = spark.read.parquet(hub)
      assert(after2.count() == 7)
      val c1 = after2.filter(col("상담번호") === "C001")
        .select("등급기준").collect()(0).getString(0)
      assert(c1 == "중대") // later upload wins
    } finally q.stop()
  }

  test("streaming ingest keeps the bucketed mart current across a key move") {
    val landing = Files.createTempDirectory("landingm").toString
    val hub = Files.createTempDirectory("hubm").toString + "/hub"
    val ckpt = Files.createTempDirectory("ckptm").toString
    val mart = Files.createTempDirectory("martm").toString + "/mart"

    val q = StreamingIngest.start(spark, landing, hub, ckpt,
      martDir = Some(mart), asOfClock = () => "2024-03-01")
    try {
      Files.copy(
        Paths.get(getClass.getResource("/claims_fixture.csv").getPath),
        Paths.get(landing, "upload1.csv"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(spark.read.parquet(mart).count() == 2,
        "first upload full-builds the mart alongside the hub")

      // C003 re-filed under PLANT_B (same receipt date → same spine):
      // the incremental refresh must regenerate BOTH documents — the
      // one the claim left (prior-keys probe) and the one it joined.
      val move =
        "상담번호,접수년,접수월,접수일,플랜트,제품범주2,대분류\n" +
          "C003,2023,11,15,PLANT_B,CAT2_Y,MAJOR_S\n"
      Files.write(Paths.get(landing, "upload2.csv"), move.getBytes("UTF-8"))
      q.processAllAvailable()

      val hubDf = spark.read.parquet(hub)
      val docs = spark.read.parquet(mart).drop("key_bucket")
        .toJSON.collect().toSet
      val full = graft.claims.SeriesMart.build(hubDf, "2024-03-01")
        .toJSON.collect().toSet
      assert(docs == full,
        "the streamed mart equals a full rebuild of the streamed hub")
    } finally q.stop()
  }

  test("two uploads with different header orders ingest by NAME in one batch") {
    // The round-9 review case: a single multi-path csv() read binds
    // every file after the first POSITIONALLY (schema from file one,
    // headers skipped), scrambling an upload whose columns arrive in a
    // different order. Per-file canonicalize54 + unionByName must map
    // both headers by name.
    val landing = Files.createTempDirectory("landing2").toString
    val hub = Files.createTempDirectory("hub2").toString + "/hub"
    val ckpt = Files.createTempDirectory("ckpt2").toString
    val q = StreamingIngest.start(spark, landing, hub, ckpt)
    try {
      // Same columns, OPPOSITE orders, dropped in the same micro-batch.
      Files.write(Paths.get(landing, "a.csv"),
        ("상담번호,접수년,접수월,접수일,플랜트,등급기준\n" +
          "N001,2024,1,5,PLANT_A,일반\n").getBytes("UTF-8"))
      Files.write(Paths.get(landing, "b.csv"),
        ("등급기준,플랜트,접수일,접수월,접수년,상담번호\n" +
          "중대,PLANT_B,9,2,2024,N002\n").getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.read.parquet(hub)
        .select(col("상담번호"), col("플랜트"), col("등급기준"),
          col("접수년").cast("string"))
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getString(2), r.getString(3))).toMap
      assert(rows("N001") == (("PLANT_A", "일반", "2024")))
      assert(rows("N002") == (("PLANT_B", "중대", "2024")),
        "the second file's columns must bind by header name, not position")
    } finally q.stop()
  }

  test("stateful alert stream emits on cumulative thresholds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val df = mem.toDF().withColumnRenamed("value", "플랜트")
    val out = StreamingIngest.alertStream(df, alertEvery = 3)
    val q = out.writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      mem.addData(Seq.fill(4)("P1") ++ Seq.fill(2)("P2"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(3)("P1") :+ "P2": _*) // P1: 4→7 crosses 6; P2: 2→3
      q.processAllAvailable()
      val rows = spark.sql("select * from alerts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("P1", 3L), ("P1", 6L), ("P2", 3L)))
    } finally q.stop()
  }

  test("session windows merge across micro-batches (q_stream_session kernel)") {
    // The driver entry streams ONE parquet file (a single micro-batch),
    // so this is where cross-batch session-window state merging is
    // actually exercised: user 1's 10:00 event (batch 1) must fuse with
    // 11:00 (batch 2) and 11:30 (batch 3) into one session while 20:00
    // starts a new one past the 2-hour gap.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().withColumnRenamed("_1", "user_id")
      .withColumn("ts", to_timestamp(col("_2"))).drop("_2")
    val agg = df.withWatermark("ts", "2 days")
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
      .agg(min("ts").as("ss"), max("ts").as("se"), count(lit(1)).as("n"))
      .select("user_id", "ss", "se", "n")
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      mem.addData((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      mem.addData((1L, "2024-01-01 11:00:00"), (2L, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      mem.addData((1L, "2024-01-01 11:30:00"), (1L, "2024-01-01 20:00:00"))
      q.processAllAvailable()
      val rows = spark.sql(
        "select user_id, cast(ss as string), cast(se as string), n from sess")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(rows == Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 11:30:00", 3L),
        (1L, "2024-01-01 20:00:00", "2024-01-01 20:00:00", 1L),
        (2L, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1L),
        (2L, "2024-01-01 13:00:00", "2024-01-01 13:00:00", 1L)))
    } finally q.stop()
  }

  test("watermarked windowed counts run on a claims stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF()
      .withColumnRenamed("_1", "플랜트")
      .withColumn("접수일자", to_date(col("_2")))
    val out = StreamingIngest.windowedCounts(df)
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      mem.addData(("P1", "2024-01-01"), ("P1", "2024-01-05"), ("P2", "2024-01-02"))
      mem.addData(("P1", "2024-06-01")) // advances watermark past January
      q.processAllAvailable()
      val rows = spark.sql("select * from wc").collect()
      assert(rows.exists(r => r.getString(0) == "P1" && r.getLong(2) == 2L))
    } finally q.stop()
  }
}
