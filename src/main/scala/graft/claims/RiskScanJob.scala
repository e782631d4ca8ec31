package graft.claims

import java.time.{LocalDate, YearMonth}

import graft.claims.analytics.{RiskResult, RiskScoringEngine}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The hot dashboard query: monthly counts per key → zero-filled series
  * → statistical risk score per key → scored report
  * (ref: app.py:262-324 `load_and_scan_risks`; SURVEY.md §3.2).
  *
  * Execution shape: ONE shuffle (groupBy key+month partial-agg), then a
  * second small shuffle on key to assemble the bounded per-key series
  * (`collect_list` of ≤ a few hundred month structs), scored inside a
  * codegen-compatible UDF. Embarrassingly parallel across keys — the
  * 100 TB scan reduces to (#keys × #months) rows before any per-series
  * work happens, so executors never hold more than a series at a time.
  */
object RiskScanJob {

  /** A1 — monthly counts per key (ref: app.py:281). */
  def monthlyCounts(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame =
    df.groupBy((keyCols.map(col) :+
        date_format(col(dateCol), "yyyy-MM").as("ym")): _*)
      .agg(count(lit(1)).as("n"))

  /** A7/J4 — densify to the global min→max month spine, absent → 0
    * (ref: core/storage.py:472-483). Spine and key list are broadcast.
    */
  def zeroFill(counts: DataFrame, keyCols: Seq[String]): DataFrame = {
    val spark = counts.sparkSession
    val bounds = counts.agg(min(col("ym")).as("lo"), max(col("ym")).as("hi"))
    val months = bounds.select(explode(sequence(
      to_date(col("lo"), "yyyy-MM"), to_date(col("hi"), "yyyy-MM"),
      expr("interval 1 month"))).as("md"))
      .select(date_format(col("md"), "yyyy-MM").as("ym"))
    val keys = counts.select(keyCols.map(col): _*).distinct()
    broadcast(months).crossJoin(keys)
      .join(counts, keyCols :+ "ym", "left")
      .na.fill(0L, Seq("n"))
  }

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
    */
  def scan(df: DataFrame, keyCols: Seq[String], dateCol: String,
      gradeCol: Option[String], asOf: LocalDate): DataFrame = {
    val counts = monthlyCounts(df, keyCols, dateCol)
    val filled = zeroFill(counts, keyCols)
    val target = counts.agg(max(col("ym")).as("target_ym"))

    val gradeExpr: Column =
      gradeCol.map(col).getOrElse(lit("")).cast("string")

    val series = filled
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("ym"), col("n")))).as("series"))

    val scored = series
      .crossJoin(broadcast(target))
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
