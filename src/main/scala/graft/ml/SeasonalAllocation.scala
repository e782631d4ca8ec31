package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M9 — seasonal top-down → bottom-up allocation
  * (ref: trainer.py:27-126 `predict_with_seasonal_allocation`):
  * the champion predicts 대분류 monthly totals; each future calendar
  * month's total is split across 소분류 by the historical mean share of
  * that SAME calendar month (deliberately conflating years — that is
  * the shipped spec, SURVEY.md §7.5 item 6); months with no history
  * fall back to the overall sum share. Output: one row per
  * (소분류, future month) with 예측_건수 and 점유율.
  *
  * Pure DataFrame implementation: two small aggregations + a broadcast
  * join of the forecast row — no driver loops over sub-categories.
  */
object SeasonalAllocation {

  /** @param history   columns: 접수년, 접수월, 소분류, 건수
    * @param forecasts (futureMonth 1-12, predictedTotal) pairs
    */
  def allocate(spark: SparkSession, plant: String, majorCategory: String,
      history: DataFrame, forecasts: Seq[(Int, Double)]): DataFrame = {
    import spark.implicits._
    val fdf = forecasts.toDF("접수월", "예측_총량")

    // historical same-calendar-month mean per 소분류
    val sameMonth = history
      .groupBy(col("접수월"), col("소분류"))
      .agg(avg(col("건수")).as("m건수"))
    // zero-sum guard: a calendar month whose history is all zeros has
    // no shape to allocate by — its share is left null here so the
    // month falls through to the overall fallback instead of emitting
    // null forecasts (or DIVIDE_BY_ZERO under ANSI sessions).
    val monthShares = sameMonth
      .withColumn("__mtot", sum(col("m건수")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("접수월")))
      .withColumn("점유율",
        when(col("__mtot") =!= 0.0, col("m건수") / col("__mtot")))
      .drop("__mtot")

    // fallback: overall sum share (used for future months with no
    // history); global window over the aggregated per-category sums —
    // bounded input, and a broadcast-total branch would recompute the
    // aggregation (see RelationalQueries.aggTopShare)
    val overall = history
      .groupBy(col("소분류"))
      .agg(sum(col("건수")).as("s건수"))
      .withColumn("__tot", sum(col("s건수")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      // all-zero history: equal split keeps the allocation total equal
      // to the champion's prediction instead of nulling it out
      .withColumn("점유율_fb",
        when(col("__tot") =!= 0.0, col("s건수") / col("__tot"))
          .otherwise(lit(1.0) / count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy())))
      .drop("__tot")

    val monthsWithHistory = sameMonth.select("접수월").distinct()
      .withColumn("__has_hist", lit(true))

    // broadcast the BUILD side: a left-outer join cannot build its
    // preserved (left) side, so hinting fdf was a no-op warning
    val withHist = fdf
      .join(broadcast(monthsWithHistory), Seq("접수월"), "left")
      .na.fill(false, Seq("__has_hist"))

    val fromMonth = withHist.filter(col("__has_hist"))
      .join(monthShares, Seq("접수월"))
      // an all-zero month left its share null above — fall through to
      // the overall share so the month's predicted total is preserved
      .join(broadcast(overall.select(col("소분류"), col("점유율_fb"))),
        Seq("소분류"), "left")
      .select(col("접수월"), col("소분류"),
        coalesce(col("점유율"), col("점유율_fb")).as("점유율"),
        col("예측_총량"))
    val fromFallback = withHist.filter(!col("__has_hist"))
      .crossJoin(overall.select(col("소분류"), col("점유율_fb").as("점유율")))
      .select(col("접수월"), col("소분류"), col("점유율"), col("예측_총량"))

    fromMonth.unionByName(fromFallback)
      .select(
        lit(plant).as("플랜트"),
        lit(majorCategory).as("대분류"),
        col("소분류"),
        col("접수월"),
        (col("예측_총량") * col("점유율")).as("예측_건수"),
        col("점유율"))
      .orderBy("접수월", "소분류")
  }
}
