package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.claims.PivotWithSubtotals
import graft.ml.FleetTrainer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-layer and composite-pivot surface on the generic tables. */
object MlQueries extends QueryModule {

  /** A11 full form — pivot with subtotal/total label rows and a Total
    * column (ref: pages/3:270-317), on orders-1995.
    */
  private def pivotSubtotals(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1995)
      .withColumn("mo", month(col("o_orderdate")))
    PivotWithSubtotals.build(base,
      indices = Seq("o_orderstatus", "o_orderpriority"),
      monthCol = "mo", allMonths = (1 to 12).map(_.toString))
  }

  /** M1–M8 — distributed per-key champion training + forecast over the
    * monthly order series (seeded search ⇒ deterministic; stat model
    * outputs have no SQL oracle → rows-only + ForecastSpec coverage).
    * Forecast/CI arrays are exploded to one scalar row per (key, step)
    * so the driver's tabular compare can hash the output.
    */
  private def fleetForecast(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"fleet|$d") {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"))
      val out = FleetTrainer.trainAll(monthly, Seq("o_orderpriority"),
        steps = 3, nTrials = 5)
        .select(col("o_orderpriority"), col("champion"), col("test_rmse"),
          posexplode(arrays_zip(col("forecast"), col("ci_lower"), col("ci_upper"))))
        .select(col("o_orderpriority"), col("champion"), col("test_rmse"),
          (col("pos") + 1).as("step"),
          round(col("col.forecast"), 2).as("forecast"),
          round(col("col.ci_lower"), 2).as("ci_lower"),
          round(col("col.ci_upper"), 2).as("ci_upper"))
        .persist()
      out.count() // train once per (session, dataset); audit reads the cache
      (out, Seq(out))
    }

  /** Structural soundness audit for the forecast surface (M8 contract):
    * CI lower bound floored at 0 and ≤ upper, point forecast ≤ upper
    * (the point is NOT floored — reference parity, it can go negative
    * while the floored lower bound sits at 0), step within horizon,
    * champion from the registered model set, non-negative test RMSE.
    * Violations emitted; the oracle asserts the set is EMPTY.
    */
  private def fleetForecastSound(s: SparkSession, d: String): DataFrame =
    fleetForecast(s, d)
      .filter(not(
        col("ci_lower") >= 0 && col("ci_lower") <= col("ci_upper") &&
        col("forecast") <= col("ci_upper") &&
        col("step").between(1, 3) &&
        col("champion").isin("SARIMAX", "CatBoost", "LSTM") &&
        col("test_rmse") >= 0))
      .select(col("o_orderpriority"), col("champion"),
        col("step").cast("long").as("step"), col("forecast"),
        col("ci_lower"), col("ci_upper"))

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_pivot_subtotals", pivotSubtotals, Some {
      val monthCols = (1 to 12).map(i =>
        s"""count(CASE WHEN mo = $i THEN 1 END) AS "$i"""").mkString(",\n  ")
      s"""WITH base AS (
         |  SELECT o_orderstatus AS s, o_orderpriority AS p,
         |         month(o_orderdate) AS mo
         |  FROM orders WHERE year(o_orderdate) = 1995),
         |r AS (SELECT s, p, GROUPING(s) AS gs, GROUPING(p) AS gp,
         |  $monthCols,
         |  count(*) AS total
         |FROM base GROUP BY ROLLUP(s, p))
         |SELECT
         |  CASE WHEN gs = 1 THEN 'Total' ELSE s END AS o_orderstatus,
         |  CASE WHEN gs = 1 THEN '' WHEN gp = 1 THEN '전체 합계' ELSE p END
         |    AS o_orderpriority,
         |  "1","2","3","4","5","6","7","8","9","10","11","12",
         |  CAST(total AS BIGINT) AS "Total"
         |FROM r ORDER BY 1, 2""".stripMargin
    }),
    QueryDef("q_fleet_forecast", fleetForecast, None),
    QueryDef("q_fleet_forecast_sound", fleetForecastSound, Some(
      """SELECT CAST(NULL AS VARCHAR) AS o_orderpriority,
        |  CAST(NULL AS VARCHAR) AS champion, CAST(NULL AS BIGINT) AS step,
        |  CAST(NULL AS DOUBLE) AS forecast, CAST(NULL AS DOUBLE) AS ci_lower,
        |  CAST(NULL AS DOUBLE) AS ci_upper WHERE FALSE""".stripMargin))
  )
}
