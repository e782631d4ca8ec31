package graft.claims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized end-to-end equivalence for the incremental maintenance
  * pipeline: a seeded sequence of hostile uploads — key moves across
  * parents AND months, re-uploads, spine extensions, null children,
  * undated rows — driven through the REAL [[UploadFlow]] must leave,
  * after every single batch:
  *   mart  ≡ SeriesMart.build(hub)   (modulo untouched-doc stamps)
  *   counts ≡ SeriesCounts.aggregate(hub)
  * This is the generative counterpart of the constructed cases in
  * SeriesCountsSpec/SeriesMartSpec: any divergence between the
  * journal/replacement algebra and the from-scratch semantics shows
  * up here without having to predict the failing interleaving.
  */
class UploadFlowPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val plants = Seq("PL_A", "PL_B")
  private val cats = Seq("C1", "C_2") // one separator-hostile value
  private val majors = Seq("MA", "MB")
  private val middles = Seq("S1", "S2", null)

  private def randomBatch(rnd: scala.util.Random): DataFrame = {
    import spark.implicits._
    val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
      val key = s"C${rnd.nextInt(30)}"
      // Months mostly inside 2023-01..2023-06; occasionally beyond
      // (spine extension, the first-upload-of-a-month event).
      val month = 1 + rnd.nextInt(if (rnd.nextInt(4) == 0) 9 else 6)
      // Occasionally an unparseable day → null receipt date (undated
      // rows must still keep their key's document alive).
      val day = if (rnd.nextInt(8) == 0) "" else (1 + rnd.nextInt(28)).toString
      (key, "2023", month.toString, day,
        plants(rnd.nextInt(plants.length)),
        cats(rnd.nextInt(cats.length)),
        majors(rnd.nextInt(majors.length)),
        middles(rnd.nextInt(middles.length)),
        // 제조일자 behind the receipt date → a mix of valid/invalid lags
        if (rnd.nextBoolean()) s"2023-0${1 + rnd.nextInt(4)}-10" else null)
    }
    ClaimsEtl.preprocess(ClaimsEtl.canonicalize54(
      ClaimsEtl.withIngestSeq(rows.toDF("상담번호", "접수년", "접수월",
        "접수일", "플랜트", "제품범주2", "대분류", "중분류", "제조일자"))))
  }

  private def unstamped(docs: Set[String]): Set[String] =
    docs.map(_.replaceAll("\"last_updated\":\"[^\"]*\"", ""))

  test("random upload sequences: flow state equals from-scratch state after every batch") {
    // Fixed seed for the repeatable suite; GRAFT_PROP_SEED sweeps
    // fresh sequences in exploratory runs without touching the code.
    val rnd = new scala.util.Random(sys.env.get("GRAFT_PROP_SEED")
      .flatMap(_.toLongOption).getOrElse(20260814L))
    val base = java.nio.file.Files.createTempDirectory("flowprop").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    val countsDir = SeriesCounts.dirFor(martDir)
    for (i <- 1 to 6) {
      val batch = randomBatch(rnd)
      UploadFlow.run(spark, batch, hubPath, martDir, f"2024-01-$i%02d")
      val hub = HubStore.read(spark, hubPath)
      // Mart ≡ full rebuild, modulo the untouched-doc stamp freedom.
      val got = unstamped(spark.read.parquet(martDir).drop("key_bucket")
        .toJSON.collect().toSet)
      val want = unstamped(SeriesMart.build(hub, f"2024-01-$i%02d")
        .toJSON.collect().toSet)
      assert(got == want, s"mart diverged from full rebuild after batch $i\n" +
        s"only-in-flow: ${(got -- want).take(2)}\n" +
        s"only-in-full: ${(want -- got).take(2)}")
      // Counts ≡ fresh aggregation of the hub.
      val cols = SeriesCounts.grainCols.map(col) ++
        Seq(col("ym"), col("n_all"), col("n_valid"), col("sum_lag")) ++
        ClaimsSchema.partitionCols.map(c => col(c).cast("int"))
      val stored = SeriesCounts.read(spark, countsDir).select(cols: _*)
      val expect = SeriesCounts.aggregate(hub).select(cols: _*)
      assert(stored.exceptAll(expect).isEmpty &&
        expect.exceptAll(stored).isEmpty,
        s"count store diverged from a fresh aggregation after batch $i")
      // No stranded journal generations after a completed flow.
      val leftovers = new java.io.File(countsDir).listFiles()
        .map(_.getName)
        .filter(n => n.startsWith(SeriesCounts.pendingPartsFile))
      assert(leftovers.isEmpty, s"unconsumed count journals: ${leftovers.toSeq}")
    }
  }

  test("random sequence with injected crashes still converges") {
    // Every third batch "crashes" after the hub commit (journals
    // written, counts/mart never updated); the next batch's flow must
    // heal it. This drives the replay path under randomized state
    // rather than the constructed single-crash cases.
    val rnd = new scala.util.Random(7L)
    val base = java.nio.file.Files.createTempDirectory("flowcrashp").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    val countsDir = SeriesCounts.dirFor(martDir)
    for (i <- 1 to 6) {
      val batch = randomBatch(rnd)
      if (i % 3 == 0) {
        // The crashed attempt: the flow's own pre-refresh steps.
        val priors =
          if (HubStore.exists(spark, hubPath))
            SeriesMart.priorParentKeys(HubStore.read(spark, hubPath), batch)
          else Set.empty[String]
        if (priors.nonEmpty)
          SeriesMart.journalTouchedKeys(spark, martDir, priors)
        HubStore.upsert(spark, batch, hubPath, onAffected = p =>
          SeriesCounts.journalParts(spark, countsDir, p))
      } else {
        UploadFlow.run(spark, batch, hubPath, martDir, f"2024-02-$i%02d")
        val hub = HubStore.read(spark, hubPath)
        val got = unstamped(spark.read.parquet(martDir).drop("key_bucket")
          .toJSON.collect().toSet)
        val want = unstamped(SeriesMart.build(hub, f"2024-02-$i%02d")
          .toJSON.collect().toSet)
        assert(got == want,
          s"mart diverged after healing batch $i's predecessor crash")
      }
    }
  }
}
