package graft.claims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL: file ingest → canonical 54 fields → preprocess (dates, lag).
  * Spark re-expression of the reference pipeline
  * (ref: core/etl.py:13-280); every step is a narrow, codegen-friendly
  * projection — the only shuffle in the whole ETL is the keyed dedup.
  */
object ClaimsEtl {

  import ClaimsSchema._

  /** S1 — CSV load (header, UTF-8 with optional BOM; the reference reads
    * `utf-8-sig`, ref: core/etl.py:37-38, core/config.py:97). A BOM
    * surviving in the first header cell is stripped. Every row gets an
    * explicit ingest-sequence number carrying the file row order that
    * pandas `keep='last'` dedup implicitly relies on.
    */
  def loadCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .option("mode", "PERMISSIVE")
      .csv(path)
    val cleaned = raw.columns.headOption match {
      case Some(first) if first.startsWith("﻿") =>
        raw.withColumnRenamed(first, first.stripPrefix("﻿"))
      case _ => raw
    }
    withIngestSeq(cleaned)
  }

  /** S2 — Excel load (the reference's primary upload path, ref:
    * core/etl.py:39-40 `pd.read_excel`, pages/1:37): first worksheet,
    * row 1 = header, all cells string-typed like the CSV path (pandas
    * `object` parity; canonicalize54 owns typing downstream). Parsed
    * driver-side — an uploaded workbook is a driver-sized artifact —
    * then parallelized with the same explicit ingest-sequence contract
    * as loadCsv.
    */
  def loadExcel(spark: SparkSession, path: String): DataFrame =
    withIngestSeq(graft.sources.Xlsx.read(spark, path))

  /** Attach the explicit ingest order (SURVEY.md §7.5 item 1).
    * `monotonically_increasing_id` is non-decreasing in (partition,
    * row-in-partition) order, which for a file source equals file order
    * — exactly the physical order pandas sees.
    */
  def withIngestSeq(df: DataFrame): DataFrame =
    if (df.columns.contains(ingestSeqCol)) df
    else df.withColumn(ingestSeqCol, monotonically_increasing_id())

  /** P1 — canonicalize to exactly the 54 columns: present kept, missing
    * → null, extra dropped (ref: core/etl.py:50-71). All string-typed at
    * this stage, like pandas `object`.
    */
  def canonicalize54(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = target54.map { c =>
      if (present.contains(c)) col(quoted(c)).cast("string").as(c)
      else lit(null).cast("string").as(c)
    } ++ (if (present.contains(ingestSeqCol)) Seq(col(ingestSeqCol)) else Nil)
    df.select(cols: _*)
  }

  /** P3 — full-row dedup over ALL data columns of the given frame
    * (ref: core/etl.py:135, `drop_duplicates` with no subset). The
    * ingest pipeline applies it to the RAW frame BEFORE canonicalize54
    * — the reference's order, r10 — so rows differing only in a
    * later-dropped extra column are both kept. The ingest-seq col is
    * excluded from the key, keeping the smallest sequence per
    * duplicate group so later keyed dedup sees a deterministic
    * survivor.
    */
  def dropFullDuplicates(df: DataFrame): DataFrame = {
    val keys = df.columns.filterNot(_ == ingestSeqCol)
    if (df.columns.contains(ingestSeqCol)) {
      val w = Window.partitionBy(keys.map(c => col(quoted(c))): _*)
      df.withColumn("__rmin", min(ingestSeqCol).over(w))
        .filter(col(ingestSeqCol) === col("__rmin"))
        .drop("__rmin")
    } else df.dropDuplicates()
  }

  /** Quality report (ref: core/etl.py:74-102) — one pass, one job. */
  final case class QualityReport(
      totalRows: Long,
      expectedCols: Int,
      actualCols: Int,
      colsOk: Boolean,
      duplicateCount: Long,
      nullCounts: Map[String, Long])

  def validateQuality(df: DataFrame): QualityReport = {
    val dataCols = df.columns.filterNot(_ == ingestSeqCol)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        Seq(countDistinct(struct(dataCols.map(c => col(quoted(c))): _*)).as("__distinct")) ++
        dataCols.map(c => sum(when(col(quoted(c)).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    QualityReport(
      totalRows = n,
      expectedCols = target54.length,
      actualCols = dataCols.length,
      colsOk = dataCols.length == target54.length,
      duplicateCount = n - row.getAs[Long]("__distinct"),
      nullCounts = dataCols.map(c => c -> row.getAs[Long](s"null_$c")).toMap)
  }

  /** F1 — multi-format date parse with priority yyyy/MM/dd → yyyy-MM-dd
    * → yyyy.MM.dd, failure → null (ref: core/etl.py:149-178).
    */
  def safeDateParse(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy/MM/dd")).cast("date"),
      try_to_timestamp(c, lit("yyyy-MM-dd")).cast("date"),
      try_to_timestamp(c, lit("yyyy.MM.dd")).cast("date"),
      // datetime forms: pandas to_datetime (the reference's parser)
      // accepts them, and the Xlsx reader deliberately emits
      // "yyyy-MM-dd HH:mm:ss" for datetime-styled cells — without
      // these a perfectly readable Excel date nulled out downstream
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")).cast("date"),
      try_to_timestamp(c, lit("yyyy/MM/dd HH:mm:ss")).cast("date"))

  /** F10 — epoch-milliseconds heuristic clean used by the dashboard for
    * 제조일자 arriving as a number (ref: app.py:449-458): value > 1e12 →
    * epoch-ms date, else multi-format parse.
    */
  def cleanMfgDate(c: Column): Column = {
    val asNum = c.cast("double")
    when(asNum > 1e12, to_date(timestamp_millis(asNum.cast("long"))))
      .otherwise(safeDateParse(c))
  }

  /** Preprocess (ref: core/etl.py:181-280):
    *  1. drop rows with null key (:199)
    *  2. trim key + keyed dedup keep-LAST by ingest order (:206-207)
    *  3. build 접수일자 from year/month/day parts, all required (:217-227)
    *  4. multi-format parse 제조일자/유통기한 (:237-256)
    *  5. Lag_Days / Lag_Valid (:259-265)
    *  6. numeric-coerce 접수년/접수월; if a column is entirely null,
    *     derive it from 접수일자 (:270-277)
    */
  def preprocess(input: DataFrame): DataFrame = {
    val df = withIngestSeq(input)

    // 1-2: key filter + trim + dedup keep-last
    val keyed = df
      .filter(col(keyCol).isNotNull)
      .withColumn(keyCol, trim(col(keyCol)))
    // max_by on the unique ingest sequence == keep-last, with map-side
    // combine: the claim-key shuffle carries one pre-reduced row per
    // (partition, key) instead of every raw upload row (see
    // HubStore.merge)
    val allCols = keyed.columns
    val deduped = keyed
      .groupBy(col(keyCol))
      .agg(max_by(struct(allCols.map(col): _*), col(ingestSeqCol)).as("__row"))
      .select(col("__row.*"))

    // 3: 접수일자 from parts — every part must parse numeric
    val y = expr(s"try_cast(`접수년` AS INT)")
    val m = expr(s"try_cast(`접수월` AS INT)")
    val dd = expr(s"try_cast(`접수일` AS INT)")
    val withReceipt = deduped.withColumn(receiptDateCol,
      when(y.isNotNull && m.isNotNull && dd.isNotNull, make_date(y, m, dd)))

    // 4: multi-format date columns. 제조일자 additionally takes the
    // epoch-ms heuristic (cleanMfgDate — app.py:449-458): before
    // round 9 the heuristic existed only as the F10 entry, so a
    // manufacture date uploaded as '1696118400000' became NULL here
    // and the value was unrecoverable by the time LOT detection
    // wanted it.
    val withDates = parsedDateCols.foldLeft(withReceipt) { (acc, c) =>
      acc.withColumn(c,
        if (c == "제조일자") cleanMfgDate(col(quoted(c)))
        else safeDateParse(col(quoted(c))))
    }

    // 5: lag derivation — negative lag flagged invalid, not dropped
    val withLag = withDates
      .withColumn(lagDaysCol, datediff(col(receiptDateCol), col("제조일자")))
      .withColumn(lagValidCol,
        col(receiptDateCol).isNotNull && col("제조일자").isNotNull &&
          col(lagDaysCol) >= 0)

    // 6: numeric 접수년/접수월, deriving from 접수일자 when entirely null
    val stats = withLag.agg(
      count(col("접수년")).as("__y_cnt"),
      count(col("접수월")).as("__m_cnt"))
    withLag
      .crossJoin(broadcast(stats))
      .withColumn("접수년",
        when(col("__y_cnt") === 0, year(col(receiptDateCol))).otherwise(y))
      .withColumn("접수월",
        when(col("__m_cnt") === 0, month(col(receiptDateCol))).otherwise(m))
      .withColumn("접수일", dd)
      .drop("__y_cnt", "__m_cnt")
  }

  /** End-to-end ingest: load → full dedup → canonicalize → preprocess
    * (ref: core/etl.py:131-139 + pages/1 step ordering, SURVEY.md
    * §3.1). Dedup runs on the RAW frame, matching the reference's
    * order exactly — process_claim_data drop_duplicates the raw frame
    * at etl.py:135 and only then extract_54_fields at :139. Rows
    * identical on the 54 canonical columns but differing in a dropped
    * extra column are therefore BOTH kept (the reference merely
    * reports them as residual duplicates via validate_data_quality);
    * collapsing them here would diverge row counts for such uploads.
    * StreamingIngest uses the same order.
    */
  def ingestCsv(spark: SparkSession, path: String): DataFrame =
    preprocess(canonicalize54(dropFullDuplicates(loadCsv(spark, path))))

  private def quoted(c: String): String = c
}
