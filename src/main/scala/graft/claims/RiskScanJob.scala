package graft.claims

import java.time.{LocalDate, YearMonth}

import graft.claims.analytics.{RiskResult, RiskScoringEngine}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The hot dashboard query: monthly counts per key → zero-filled series
  * → statistical risk score per key → scored report
  * (ref: app.py:262-324 `load_and_scan_risks`; SURVEY.md §3.2).
  *
  * Execution shape: one column-pruned bounds scan (no shuffle), then
  * one fact scan feeding two post-aggregation shuffles — (key, month)
  * partial counts, then per-key month→count maps of ≤ a few hundred
  * entries, densified against the broadcast-literal month spine and
  * scored inside a codegen-compatible UDF. Embarrassingly parallel
  * across keys — the 100 TB scan reduces to (#keys × #months) rows
  * before any per-series work happens, so executors never hold more
  * than a series at a time.
  */
object RiskScanJob {

  /** A1 — monthly counts per key (ref: app.py:281). */
  def monthlyCounts(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame =
    df.groupBy((keyCols.map(col) :+
        date_format(col(dateCol), "yyyy-MM").as("ym")): _*)
      .agg(count(lit(1)).as("n"))

  private val scoreUdf = udf {
    (series: Seq[Row], grade: String, targetYm: String, asOfIso: String) =>
      val parsed = series.map(r =>
        (YearMonth.parse(r.getAs[String]("ym")), r.getAs[Long]("n").toDouble))
        .toIndexedSeq
      RiskScoringEngine.calculateAdvancedRiskScore(
        parsed,
        YearMonth.parse(targetYm),
        Option(grade).filter(_.nonEmpty),
        LocalDate.parse(asOfIso))
  }

  /** Full risk scan. `gradeCol` supplies the per-key grade (등급기준);
    * `asOf` replaces the reference's wall-clock now. Target month =
    * month of the max date in the fact table (ref: app.py:275-278).
    * Output: key columns + score/status/reason + last-6-month trend
    * string (ref: app.py:306-307) + current-month count, sorted by
    * score descending (ref: app.py:322).
    *
    * Two jobs over the fact table, by design: a column-pruned min/max
    * over the date column (1-row partial agg, no shuffle — the global
    * month spine must be known before any per-key series can densify),
    * then ONE scan + ONE shuffle building per-key month→count maps,
    * zero-filled against the driver-built spine inside a `transform`.
    * The round-3 shape instead re-derived the counts aggregate four
    * times (spine bounds, key list, fill join, target month) — four
    * fact scans and three extra exchanges that a 100 TB hub cannot
    * afford.
    */
  def scan(df: DataFrame, keyCols: Seq[String], dateCol: String,
      gradeCol: Option[String], asOf: LocalDate,
      maxSpineMonths: Int = 1200): DataFrame = {
    // The grade rides the series key: monthlyCounts groups by keyCols,
    // so a grade column that is not itself part of the key no longer
    // exists by scoring time — fail loudly instead of UNRESOLVED_COLUMN
    // (the coupling used to be implicit in the one caller).
    require(gradeCol.forall(keyCols.contains),
      s"gradeCol ${gradeCol.getOrElse("")} must be one of keyCols " +
        s"(${keyCols.mkString(", ")}): the scan scores one grade per key")
    val ymOf = date_format(col(dateCol), "yyyy-MM")
    val bounds = df.agg(min(ymOf).as("lo"), max(ymOf).as("hi")).head()
    val months: Seq[String] =
      if (bounds.isNullAt(0)) Nil
      else {
        val lo = YearMonth.parse(bounds.getString(0))
        val hi = YearMonth.parse(bounds.getString(1))
        Iterator.iterate(lo)(_.plusMonths(1)).takeWhile(!_.isAfter(hi))
          .map(_.toString).toSeq
      }
    // One corrupt outlier date (9999-12-31) would otherwise inflate
    // the spine into tens of thousands of plan literals replicated
    // into EVERY key's series — a dirty row must fail loudly, not
    // degenerate the hot dashboard scan.
    require(months.length <= maxSpineMonths,
      s"month spine spans ${months.length} months " +
        s"(${bounds.getString(0)}..${bounds.getString(1)}) — over the " +
        s"$maxSpineMonths sanity cap; clean outlier dates or raise " +
        "maxSpineMonths")
    // Max month with any row = the spine's upper bound (counts ≥ 1).
    val targetYm = if (bounds.isNullAt(1)) "0001-01" else bounds.getString(1)
    val spine =
      if (months.isEmpty) array().cast("array<string>")
      else array(months.map(lit): _*)

    val gradeExpr: Column =
      gradeCol.map(col).getOrElse(lit("")).cast("string")

    // Spine months are generated ascending, so the transform yields the
    // sorted dense series directly — no sort_array, no fill join.
    // Null dates group to a null ym, which map_from_entries rejects
    // (NULL_MAP_KEY, not ANSI-gated) — drop them here, matching the
    // reference's parse-failure convention (unparseable dates fall out
    // of the scan) and the pre-round-4 fill join, which never matched
    // a null month against the spine.
    val series = monthlyCounts(df, keyCols, dateCol)
      .filter(col("ym").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("ym"), col("n")))).as("__m"))
      .withColumn("series", transform(spine, ym =>
        struct(ym.as("ym"),
          // try_element_at: missing spine months are the COMMON case
          // (zero-claim months) and plain element_at throws
          // MAP_KEY_DOES_NOT_EXIST under ANSI mode — Spark 4's
          // default for sessions this library does not control
          coalesce(try_element_at(col("__m"), ym), lit(0L)).as("n"))))

    val scored = series
      .withColumn("target_ym", lit(targetYm))
      .withColumn("risk",
        scoreUdf(col("series"), gradeExpr, col("target_ym"), lit(asOf.toString)))
      .withColumn("trend",
        array_join(transform(
          when(size(col("series")) < 6, col("series"))
            .otherwise(slice(col("series"), -6, 6)),
          x => x.getField("n").cast("string")),
          " → "))
      .withColumn("cur_n", element_at(col("series"), -1).getField("n"))

    scored.select(
      keyCols.map(col) ++ Seq(
        col("risk.score").as("score"),
        col("risk.status").as("status"),
        col("risk.reason").as("reason"),
        col("trend"),
        col("cur_n"),
        col("target_ym")): _*)
      .orderBy((col("score").desc +: keyCols.map(col)): _*)
  }
}
