package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function and scalar-function surface from SURVEY.md §2.5–§2.7.
  * All month-series windows share one monthly-count aggregate so every
  * query is a single shuffle: groupBy (partial agg) → window over the
  * small per-key series.
  */
object WindowQueries extends QueryModule {

  /** Monthly order counts per priority — the shared series frame
    * (ref: the monthly claim-count series, core/storage.py:559-560).
    */
  private def monthly(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("p"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n"))

  private val monthlyCte =
    """WITH m AS (SELECT o_orderpriority AS p, strftime(o_orderdate, '%Y-%m') AS ym,
      |           count(*) AS n FROM orders GROUP BY 1,2)""".stripMargin

  private def wAsc = Window.partitionBy("p").orderBy("ym")

  /** W1 — lag features t−1..t−3 (ref: core/engine/models.py:206-221). */
  private def lagFeatures(s: SparkSession, d: String): DataFrame =
    monthly(s, d)
      .select(col("p"), col("ym"), col("n"),
        lag("n", 1).over(wAsc).as("lag1"),
        lag("n", 2).over(wAsc).as("lag2"),
        lag("n", 3).over(wAsc).as("lag3"))

  /** W2 — first difference (ref: core/analytics.py:205-209). */
  private def diffSeries(s: SparkSession, d: String): DataFrame =
    monthly(s, d)
      .select(col("p"), col("ym"), col("n"),
        (col("n") - lag("n", 1).over(wAsc)).as("diff1"))

  /** W3 — trailing-3 mean, frame [-3,-1] (the sales estimation backfill
    * window, ref: core/storage.py:419-449).
    */
  private def trailingMean(s: SparkSession, d: String): DataFrame =
    monthly(s, d)
      .select(col("p"), col("ym"), col("n"),
        round(avg("n").over(wAsc.rowsBetween(-3, -1)), 2).as("trail3"))

  /** Running cumulative sum (generic frame coverage). */
  private def runningSum(s: SparkSession, d: String): DataFrame =
    monthly(s, d)
      .select(col("p"), col("ym"), col("n"),
        sum("n").over(wAsc.rowsBetween(Window.unboundedPreceding, 0)).as("cum_n"))

  /** W9 — trailing-3 least-squares slope; for 3 equispaced points the
    * closed form is (y₃−y₁)/2 (ref: core/storage.py:491-500 polyfit).
    */
  private def slope3(s: SparkSession, d: String): DataFrame =
    monthly(s, d)
      .withColumn("n2", lag("n", 2).over(wAsc))
      .withColumn("rn", row_number().over(Window.partitionBy("p").orderBy(col("ym").desc)))
      .filter(col("rn") === 1)
      .select(col("p"), round((col("n") - col("n2")) / 2.0, 2).as("slope"))

  /** The ranking window-function family in one keyed pass: rank,
    * dense_rank, percent_rank, cume_dist, ntile(4) over each
    * priority's monthly series — completing the window surface beyond
    * row_number/lag/frames. One shuffle (the shared monthly aggregate
    * feeds a window keyed by priority); the ordering (n desc, ym) is
    * total, so every function is deterministic. percent_rank and
    * cume_dist divide exact ints in one IEEE operation — bit-equal
    * across engines without rounding.
    */
  private def rankStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("p").orderBy(col("n").desc, col("ym"))
    monthly(s, d)
      .select(col("p"), col("ym"), col("n"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
  }

  /** Grouped least-squares trend line over each priority's monthly
    * series — the closed-form regression the reference's polyfit calls
    * compute per series (slope3 is its 3-point special case; this is
    * the general n-point fit). Spark ships `regr_slope`/`regr_intercept`,
    * but their running-double moments accumulate in partition order —
    * not reproducible against another engine. Here every moment (Σx,
    * Σy, Σxy, Σx²) is an EXACT integer aggregate over the month index
    * x = (year−1970)·12 + month−1 and the integer count y, so both
    * engines divide the same two exact integers: slope and intercept
    * are bit-equal without rounding. Map-side partial sums; the moment
    * shuffle carries five longs per key.
    */
  private def regressionTrend(s: SparkSession, d: String): DataFrame = {
    val x = (substring(col("ym"), 1, 4).cast("long") - 1970) * 12 +
      substring(col("ym"), 6, 2).cast("long") - 1
    val num = (col("cnt") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("cnt") * col("sxx") - col("sx") * col("sx")).cast("double")
    // Degenerate series (one month, or all-equal x) make den = 0; Spark's
    // non-ANSI double division returns NULL there while DuckDB returns
    // inf/NaN. Guard explicitly on BOTH sides so the engines agree by
    // construction rather than by data shape.
    val slope = when(den =!= 0.0, num / den)
    monthly(s, d)
      .select(col("p"), x.as("x"), col("n").as("y"))
      .groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p"), slope.as("slope"),
        ((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("cnt").cast("double")).as("intercept"))
      .orderBy(col("p"))
  }

  /** CUSUM changepoint per series — the sequential drift detector
    * (the online counterpart of the KS source-drift entry, and the
    * classic level-shift estimator behind the reference's early-warning
    * intent): for each priority's monthly counts, the cumulative
    * deviation from the series mean is kept EXACT by scaling —
    * CUSUM_k = n·Σ_{i≤k}x_i − k·Σx (integers; no mean division) — and
    * the changepoint is the month maximizing |CUSUM| (earliest on
    * ties). One keyed window over the monthly aggregate (the unbounded
    * n/S frames and the running sum share its single exchange); the
    * argmax is a rank-1 filter, so everything is hash-exact.
    */
  private def cusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.partitionBy("p")
    val wRun = Window.partitionBy("p").orderBy("ym")
    val scored = monthly(s, d)
      .withColumn("nm", count(lit(1)).over(wAll))
      .withColumn("tot", sum("n").over(wAll))
      .withColumn("k", row_number().over(wRun))
      .withColumn("cum", sum("n").over(wRun))
      .withColumn("cusum", col("nm") * col("cum") - col("k") * col("tot"))
    val wPick = Window.partitionBy("p")
      .orderBy(abs(col("cusum")).desc, col("ym"))
    scored.withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("p"), col("ym").as("cp_month"),
        abs(col("cusum")).as("max_abs_cusum"))
      .orderBy(col("p"))
  }

  /** O1/O2 — multi-column sort + top-k (ref: app.py:322, 472). */
  private def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Top-k PER GROUP via rank filter — written as the window form
    * because Spark rewrites `rank ≤ k` into WindowGroupLimit: each map
    * task keeps only its local top-k per key BEFORE the exchange, so
    * the shuffle carries ≤ k·keys·tasks rows instead of the whole fact
    * table (the per-group analog of TakeOrdered; plan-pinned in
    * PlanAuditSpec). Fully deterministic order: (price desc, key).
    */
  private def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** F12 — trend string of the last 6 months "a → b → c"
    * (ref: app.py:306-307; array ops: collect_list/array_sort/transform).
    */
  private def trendString(s: SparkSession, d: String): DataFrame =
    // One shuffle: assemble each key's sorted series and slice the last
    // 6 in-plan (the row_number-filter-then-agg form costs a second
    // exchange for the window; same construction as RiskScanJob.scan).
    monthly(s, d)
      .groupBy(col("p"))
      .agg(array_sort(collect_list(struct(col("ym"), col("n")))).as("series"))
      .select(col("p"),
        array_join(transform(
          when(size(col("series")) < 6, col("series"))
            .otherwise(slice(col("series"), -6, 6)),
          x => x.getField("n").cast("string")),
          " → ").as("trend"))

  /** F2–F6 — date part/arithmetic functions
    * (ref: core/etl.py:217-227, app.py:277, 346-349, 406-407).
    */
  private def dateFunctions(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since"),
        dayofmonth(last_day(col("o_orderdate"))).as("days_in_month"))

  /** F1 — multi-format date parse with priority and null-on-failure
    * (ref: core/etl.py:149-178).
    */
  private def multiformatDateParse(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("dt"))
    base
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 4 === 0, date_format(col("dt"), "yyyy/MM/dd"))
          .when(col("o_orderkey") % 4 === 1, date_format(col("dt"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 4 === 2, date_format(col("dt"), "yyyy.MM.dd"))
          .otherwise(lit("not-a-date")).as("s"))
      .select(col("o_orderkey"), col("s"),
        coalesce(
          try_to_timestamp(col("s"), lit("yyyy/MM/dd")).cast("date"),
          try_to_timestamp(col("s"), lit("yyyy-MM-dd")).cast("date"),
          try_to_timestamp(col("s"), lit("yyyy.MM.dd")).cast("date")).as("parsed"))
  }

  /** F9 — to_numeric(errors='coerce') ≡ try_cast → null
    * (ref: core/etl.py:217, core/storage.py:398-400).
    */
  private def tryCastNumeric(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, lit("12.5"))
          .when(col("o_orderkey") % 3 === 1, col("o_orderkey").cast("string"))
          .otherwise(lit("abc")).as("s"))
      .select(col("o_orderkey"), col("s"), expr("try_cast(s AS DOUBLE)").as("v"))

  /** F10 — epoch-milliseconds heuristic date clean
    * (ref: app.py:449-458 `> 1e12 → epoch ms`).
    */
  private def epochMsClean(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"))
      .select(col("o_orderkey"), col("ms"),
        to_date(timestamp_millis(col("ms"))).as("roundtrip"),
        (col("ms") > 1000000000000L).as("is_big"))

  /** F7/F8 — trim / lpad / concat_ws / regex contains / regexp_replace
    * (ref: core/etl.py:206, 241; core/storage.py:465-469).
    */
  private def stringFunctions(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        trim(col("p_name")).as("name_trim"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        col("p_name").rlike("[0-9]").as("has_digit"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
        upper(substring(col("p_name"), 1, 5)).as("prefix5"))

  /** F11/F13 — conditional bucketing + rounding (ref: app.py:498-506). */
  private def conditionalBuckets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("band"),
        col("o_totalprice"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_window_lag_features", lagFeatures, Some(
      s"""$monthlyCte
         |SELECT p, ym, n,
         | lag(n,1) OVER w AS lag1, lag(n,2) OVER w AS lag2, lag(n,3) OVER w AS lag3
         |FROM m WINDOW w AS (PARTITION BY p ORDER BY ym) ORDER BY p, ym""".stripMargin)),
    QueryDef("q_window_diff", diffSeries, Some(
      s"""$monthlyCte
         |SELECT p, ym, n, n - lag(n,1) OVER (PARTITION BY p ORDER BY ym) AS diff1
         |FROM m ORDER BY p, ym""".stripMargin)),
    QueryDef("q_window_trailing_mean", trailingMean, Some(
      s"""$monthlyCte
         |SELECT p, ym, n,
         | round(avg(n) OVER (PARTITION BY p ORDER BY ym
         |   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 2) AS trail3
         |FROM m ORDER BY p, ym""".stripMargin)),
    QueryDef("q_window_running_sum", runningSum, Some(
      s"""$monthlyCte
         |SELECT p, ym, n,
         | CAST(sum(n) OVER (PARTITION BY p ORDER BY ym
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
         |FROM m ORDER BY p, ym""".stripMargin)),
    QueryDef("q_window_slope3", slope3, Some(
      s"""$monthlyCte,
         |t AS (SELECT p, ym, n, lag(n,2) OVER (PARTITION BY p ORDER BY ym) AS n2,
         |      row_number() OVER (PARTITION BY p ORDER BY ym DESC) AS rn FROM m)
         |SELECT p, round((n - n2)/2.0, 2) AS slope FROM t WHERE rn = 1 ORDER BY p""".stripMargin)),
    QueryDef("q_cusum_changepoint", cusumChangepoint, Some(
      s"""$monthlyCte,
         |t AS (SELECT p, ym,
         |    count(*) OVER (PARTITION BY p) AS nm,
         |    sum(n) OVER (PARTITION BY p) AS tot,
         |    row_number() OVER w AS k,
         |    sum(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum
         |  FROM m WINDOW w AS (PARTITION BY p ORDER BY ym)),
         |c AS (SELECT p, ym, CAST(nm*cum - k*tot AS BIGINT) AS cusum FROM t),
         |r AS (SELECT p, ym, abs(cusum) AS a,
         |    row_number() OVER (PARTITION BY p ORDER BY abs(cusum) DESC, ym)
         |      AS rk
         |  FROM c)
         |SELECT p, ym AS cp_month, CAST(a AS BIGINT) AS max_abs_cusum
         |FROM r WHERE rk = 1 ORDER BY p""".stripMargin)),
    QueryDef("q_regression_trend", regressionTrend, Some(
      s"""$monthlyCte,
         |a AS (SELECT p, count(*) AS cnt, sum(x) AS sx, sum(y) AS sy,
         |        sum(x*y) AS sxy, sum(x*x) AS sxx
         |      FROM (SELECT p,
         |              (CAST(ym[1:4] AS BIGINT) - 1970)*12
         |                + CAST(ym[6:7] AS BIGINT) - 1 AS x,
         |              n AS y FROM m)
         |      GROUP BY 1),
         |b AS (SELECT p, cnt, sx, sy,
         |        CAST(cnt*sxy - sx*sy AS DOUBLE) AS num,
         |        CAST(cnt*sxx - sx*sx AS DOUBLE) AS den
         |      FROM a)
         |SELECT p,
         |  CASE WHEN den = 0 THEN NULL ELSE num / den END AS slope,
         |  CASE WHEN den = 0 THEN NULL ELSE
         |    (CAST(sy AS DOUBLE) - num / den * CAST(sx AS DOUBLE))
         |      / CAST(cnt AS DOUBLE) END AS intercept
         |FROM b ORDER BY p""".stripMargin)),
    QueryDef("q_window_rank_stats", rankStats, Some(
      s"""$monthlyCte
         |SELECT p, ym, n,
         | CAST(rank() OVER w AS INTEGER) AS rnk,
         | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
         | percent_rank() OVER w AS prnk,
         | cume_dist() OVER w AS cdist,
         | CAST(ntile(4) OVER w AS INTEGER) AS quartile
         |FROM m WINDOW w AS (PARTITION BY p ORDER BY n DESC, ym)
         |ORDER BY p, rnk""".stripMargin)),
    QueryDef("q_topk_orders", topkOrders, Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),
    QueryDef("q_topk_per_group", topkPerGroup, Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin)),
    QueryDef("q_trend_string", trendString, Some(
      s"""$monthlyCte,
         |t AS (SELECT p, ym, n, row_number() OVER (PARTITION BY p ORDER BY ym DESC) AS rn FROM m)
         |SELECT p, string_agg(CAST(n AS VARCHAR), ' → ' ORDER BY ym) AS trend
         |FROM t WHERE rn <= 6 GROUP BY p ORDER BY p""".stripMargin)),
    QueryDef("q_date_functions", dateFunctions, Some(
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS dd,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        | CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INTEGER) AS days_in_month
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q_multiformat_date_parse", multiformatDateParse, Some(
      """WITH base AS (
        | SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt FROM orders WHERE o_orderkey < 1000),
        |strs AS (SELECT o_orderkey,
        | CASE WHEN o_orderkey % 4 = 0 THEN strftime(dt, '%Y/%m/%d')
        |      WHEN o_orderkey % 4 = 1 THEN strftime(dt, '%Y-%m-%d')
        |      WHEN o_orderkey % 4 = 2 THEN strftime(dt, '%Y.%m.%d')
        |      ELSE 'not-a-date' END AS s FROM base)
        |SELECT o_orderkey, s,
        | CAST(coalesce(try_strptime(s, '%Y/%m/%d'), try_strptime(s, '%Y-%m-%d'),
        |   try_strptime(s, '%Y.%m.%d')) AS DATE) AS parsed
        |FROM strs ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q_try_cast", tryCastNumeric, Some(
      """SELECT o_orderkey, s, TRY_CAST(s AS DOUBLE) AS v FROM (
        | SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN '12.5'
        |       WHEN o_orderkey % 3 = 1 THEN CAST(o_orderkey AS VARCHAR)
        |       ELSE 'abc' END AS s
        | FROM orders WHERE o_orderkey < 1000) t ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q_epoch_ms_clean", epochMsClean, Some(
      """SELECT o_orderkey, ms, CAST(epoch_ms(ms) AS DATE) AS roundtrip,
        | ms > 1000000000000 AS is_big
        |FROM (SELECT o_orderkey, epoch_ms(o_orderdate) AS ms
        |      FROM orders WHERE o_orderkey < 1000) t
        |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q_string_functions", stringFunctions, Some(
      """SELECT p_partkey,
        | trim(p_name) AS name_trim,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | regexp_matches(p_name, '[0-9]') AS has_digit,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
        | upper(substr(p_name, 1, 5)) AS prefix5
        |FROM part ORDER BY p_partkey""".stripMargin)),
    QueryDef("q_conditional_buckets", conditionalBuckets, Some(
      """SELECT band, count(*) AS n, round(avg(o_totalprice),2) AS avg_price FROM (
        | SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |             WHEN o_totalprice < 150000 THEN 'mid'
        |             ELSE 'high' END AS band, o_totalprice
        | FROM orders) t GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
