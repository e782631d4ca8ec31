package graft.claims

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dashboard analytics that complete the reference surface:
  * month-end blend forecast (R10), lag stats (R11), IQR outliers (R12),
  * LOT detection (A15), top-share (A5), KPI MoM (A14) — claims-schema
  * versions of the operators already oracle-checked generically.
  */
object Dashboard {

  /** R10 — month-end blend forecast (ref: app.py:156-248
    * `predict_month_end_advanced`): weighted blend of
    *  (a) day-rate extrapolation of the current month,
    *  (b) last year's same month + YoY trendline adjustment,
    *  (c) 2-years-ago same month + a recent slope over the TWO months
    *      before the current one (`range(max(1, m-2), m)` in the
    *      reference spans two months, not three — matched bug-for-bug);
    * weights [0.4,0.4,0.2] when ≥2 YoY years have data else
    * [0.7,0.2,0.1]; clamped ≥0; confidence label.
    *
    * Pure function over the three years' monthly count maps (the
    * dashboard calls it per plant with tiny aggregated inputs).
    */
  final case class MonthEndBlend(
      predictedVal: Double, method: String, yoyBaseline: Double,
      trendSlopeYoy: Double, trendSlopeRecent: Double, confidence: String)

  def predictMonthEnd(
      thisYear: Map[Int, Double], lastYear: Map[Int, Double],
      beforeLast: Map[Int, Double], currentMonth: Int,
      daysPassed: Int, daysInMonth: Int): MonthEndBlend = {
    val empty = MonthEndBlend(0.0, "미결정", 0.0, 0.0, 0.0, "낮음")
    if (daysPassed <= 0) return empty

    val yoyCurrent = thisYear.getOrElse(currentMonth, 0.0)
    val yoyLast = lastYear.getOrElse(currentMonth, 0.0)
    val yoyBefore = beforeLast.getOrElse(currentMonth, 0.0)

    def polyfitSlope(ys: Seq[Double]): Double = {
      val n = ys.length
      if (n < 2) return 0.0
      val xm = (n - 1) / 2.0
      val ym = ys.sum / n
      val num = ys.zipWithIndex.map { case (y, i) => (i - xm) * (y - ym) }.sum
      val den = (0 until n).map(i => (i - xm) * (i - xm)).sum
      if (den == 0) 0.0 else num / den
    }

    // YoY trendline over ALL last-year months, in month order
    val lastVals = lastYear.toSeq.sortBy(_._1).map(_._2)
    val trendSlopeYoy = if (lastVals.length >= 3) polyfitSlope(lastVals) else 0.0

    // recent-2-month slope of this year before the current month
    val recentVals = (math.max(1, currentMonth - 2) until currentMonth)
      .flatMap(m => thisYear.get(m))
    val trendSlopeRecent =
      if (recentVals.length >= 2) polyfitSlope(recentVals) else 0.0

    val predBaseline = yoyCurrent / daysPassed * daysInMonth
    val progress = daysPassed.toDouble / daysInMonth
    val predYoy =
      if (math.abs(trendSlopeYoy) > 0.001) yoyLast + trendSlopeYoy * progress
      else yoyLast
    val pred2y =
      if (math.abs(trendSlopeRecent) > 0.001) yoyBefore + trendSlopeRecent * progress
      else yoyBefore

    val validYears = Seq(yoyCurrent, yoyLast, yoyBefore).count(_ > 0)
    val weights =
      if (validYears >= 2) Seq(0.4, 0.4, 0.2) else Seq(0.7, 0.2, 0.1)
    val predicted = math.max(0.0,
      weights.zip(Seq(predBaseline, predYoy, pred2y)).map(t => t._1 * t._2).sum)

    val hasYoy = yoyLast > 0
    val has2y = yoyBefore > 0
    val hasTrend =
      math.abs(trendSlopeYoy) > 0.001 || math.abs(trendSlopeRecent) > 0.001
    val confidence =
      if (hasYoy && has2y && hasTrend) "높음"
      else if (hasYoy || (has2y && hasTrend)) "중간"
      else "낮음"

    MonthEndBlend(predicted, s"YoY 가중 예측 (신뢰도: $confidence)",
      yoyLast, trendSlopeYoy, trendSlopeRecent, confidence)
  }

  /** R11/A3 — lag statistics over Lag_Valid rows (ref:
    * core/analytics.py:391-408): count / mean / exact median / min /
    * max / sample stddev.
    */
  def lagStats(hub: DataFrame, groupCols: Seq[String] = Seq("플랜트")): DataFrame = {
    // Exact median via the graft.Stats histogram kernel (lag days take
    // a few hundred distinct values however many rows a plant has);
    // the buffering `percentile` aggregate would hold every group row.
    val valid = hub.filter(col(ClaimsSchema.lagValidCol))
    val med = graft.Stats.exactPercentileByKey(valid, groupCols,
      ClaimsSchema.lagDaysCol, 0.5, "__p50")
    val agg = valid
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("count"),
        round(avg(col(ClaimsSchema.lagDaysCol)), 4).as("mean"),
        min(col(ClaimsSchema.lagDaysCol)).as("min"),
        max(col(ClaimsSchema.lagDaysCol)).as("max"),
        round(stddev_samp(col(ClaimsSchema.lagDaysCol)), 4).as("std"))
    graft.Stats.joinBackByKey(agg, groupCols, med)
      .select(groupCols.map(col) ++ Seq(col("count"), col("mean"),
        col("__p50").as("p50"), col("min"), col("max"), col("std")): _*)
  }

  /** R12 — IQR outlier detection: the reference imports a function that
    * does not exist (pages/3:21 — latent ImportError, SURVEY.md §7.5
    * item 6); implemented per its prior spec
    * (reports/phase2_7_fix_requirement.md): values outside
    * [Q1 − 1.5·IQR, Q3 + 1.5·IQR] flagged per group.
    */
  def iqrOutliers(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    // Q1/Q3 in one histogram pass (graft.Stats) — no group buffering.
    // Left join-back: a group whose values are all null has no
    // quartile row but keeps its rows (is_outlier null), matching the
    // old buffering-percentile behavior.
    val q = graft.Stats.exactPercentilesByKey(df, groupCols, valueCol,
        Seq(0.25 -> "q1", 0.75 -> "q3"))
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo", col("q1") - lit(1.5) * col("iqr"))
      .withColumn("hi", col("q3") + lit(1.5) * col("iqr"))
    graft.Stats.joinBackByKey(df, groupCols, q)
      .withColumn("is_outlier", col(valueCol) < col("lo") || col(valueCol) > col("hi"))
      .drop("q1", "q3", "iqr")
  }

  /** A15 — LOT detection on the claims schema: ≥3 claims with the same
    * (플랜트, 제품명, 제품코드, 소분류, 제조일자) within the rolling 30
    * days before the hub's max receipt date (ref: app.py:437-472).
    */
  def lotDetection(hub: DataFrame, minCount: Int = 3): DataFrame = {
    val mx = hub.agg(max(col(ClaimsSchema.receiptDateCol)).as("dmax"))
    hub.crossJoin(broadcast(mx))
      .filter(col(ClaimsSchema.receiptDateCol) >= date_sub(col("dmax"), 30))
      // The reference re-cleans 제조일자 AT detection time (epoch-ms
      // numbers or strings — clean_mfg_date, app.py:449-460) and then
      // DROPS unparseable rows (dropna, :462) before grouping: rows
      // whose manufacture dates merely failed to parse share nothing
      // and must not form a pseudo-LOT "group" that alerts. A hub
      // whose column is already date/timestamp-typed (the rebuilt ETL
      // parses with the same heuristic since round 9) skips the
      // re-clean — a date cannot cast to double; raw string/number
      // hubs get the full heuristic.
      .withColumn("제조일자", hub.schema("제조일자").dataType match {
        case org.apache.spark.sql.types.DateType => col("제조일자")
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType =>
          to_date(col("제조일자"))
        case _ => ClaimsEtl.cleanMfgDate(col("제조일자"))
      })
      .filter(col("제조일자").isNotNull)
      .groupBy(col("플랜트"), col("제품명"), col("제품코드"), col("소분류"),
        col("제조일자"))
      .agg(count(lit(1)).as("건수"),
        max(col(ClaimsSchema.receiptDateCol)).as("최근접수일"))
      .filter(col("건수") >= minCount)
      .orderBy(col("최근접수일").desc)
  }

  /** A12 — hybrid view (ref: pages/3_플랜트_분석.py:334-371): month
    * columns are split at `endYm − 23 months`; the recent 24 months
    * appear verbatim as "yyyy-MM" count columns, older months collapse
    * to one column per year rendered "{sum}({avg})" with avg rounded to
    * 1dp. Input: zero-filled monthly counts (keyCols, ym, n).
    */
  def hybridView(monthly: DataFrame, keyCols: Seq[String],
      endYm: String): DataFrame = {
    val end = java.time.YearMonth.parse(endYm)
    val recentStart = end.minusMonths(23)
    val recentMonths = (0 to 23)
      .map(i => recentStart.plusMonths(i.toLong).toString)
      .filter(_ <= endYm)

    val old = monthly.filter(col("ym") < recentStart.toString)
      .withColumn("y", substring(col("ym"), 1, 4))
      .groupBy((keyCols.map(col) :+ col("y")): _*)
      .agg(concat(sum(col("n")).cast("string"), lit("("),
        round(avg(col("n")), 1).cast("string"), lit(")")).as("render"))
    val oldYears = old.select(col("y")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val oldWide =
      if (oldYears.isEmpty) null
      else old.groupBy(keyCols.map(col): _*)
        .pivot("y", oldYears).agg(first(col("render")))

    val recentWide = monthly
      .filter(col("ym") >= recentStart.toString && col("ym") <= endYm)
      .groupBy(keyCols.map(col): _*)
      .pivot("ym", recentMonths)
      .sum("n")
      .na.fill(0L, recentMonths)

    if (oldWide == null) recentWide
    else oldWide.join(recentWide, keyCols, "full_outer")
  }

  /** A5 — top-N category share (ref: app.py:40-64). Global window over
    * the aggregated counts frame — bounded by category cardinality;
    * the broadcast-total alternative would scan the hub twice (see
    * RelationalQueries.aggTopShare).
    */
  def topShare(hub: DataFrame, catCol: String, n: Int = 2): DataFrame = {
    val counts = hub.filter(col(catCol).isNotNull)
      .groupBy(col(catCol)).agg(count(lit(1)).as("건수"))
    counts
      .withColumn("점유율",
        round(lit(100.0) * col("건수") /
          sum(col("건수")).over(Window.partitionBy()), 1))
      .orderBy(col("건수").desc, col(catCol))
      .limit(n)
  }
}
