package graft.claims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sales (매출수량) store: load/save, estimation backfill, Smart Sync
  * with claim keys, long↔wide pivots, and the PPM join
  * (ref: core/storage.py:364-458; pages/2_매출수량_관리.py:30-145;
  * PPM formula reports/phase4_step2_dashboard_report.md:510).
  *
  * Schema: ID:string, 플랜트:string, 년:int, 월:int, 매출수량:double,
  * is_estimated:boolean.
  */
object SalesStore {

  /** Calendar month index for range windows (년·12 + 월). */
  private def monthIdx = col("년") * 12 + col("월")

  /** W3 — estimation backfill (ref: core/storage.py:364-458): a
    * missing/zero month gets the mean of the ≤3 prior CALENDAR months
    * of the same plant, computed from ORIGINAL values (the reference
    * reads the pre-loop snapshot, so estimates never cascade), flagged
    * `is_estimated`. Prior-month zeros count toward the mean; prior
    * nulls don't. Spark shape: one range window per plant — no loops.
    */
  def withEstimation(sales: DataFrame, lookbackMonths: Int = 3): DataFrame = {
    val typed = sales
      .withColumn("년", expr("try_cast(`년` AS INT)"))
      .withColumn("월", expr("try_cast(`월` AS INT)"))
      .withColumn("매출수량", expr("try_cast(`매출수량` AS DOUBLE)"))
    val w = Window.partitionBy("플랜트").orderBy(monthIdx)
      .rangeBetween(-lookbackMonths, -1)
    val needsFill = col("매출수량").isNull || col("매출수량") === 0
    val trailing = avg(col("매출수량")).over(w)
    typed
      .withColumn("__est", trailing)
      .withColumn("is_estimated", needsFill && col("__est").isNotNull)
      .withColumn("매출수량",
        when(needsFill && col("__est").isNotNull, col("__est"))
          .otherwise(col("매출수량")))
      .drop("__est")
      .orderBy("플랜트", "년", "월")
  }

  /** J1/J2 — Smart Sync (ref: pages/2:66-95): claim (플랜트,년,월) keys
    * get the plant's latest sales ID and existing sales values; months
    * with no sales row are created with 매출수량 = 0.
    */
  def syncWithClaims(claimKeys: DataFrame, sales: DataFrame): DataFrame = {
    // max_by ≡ the row_number()=1 row, with map-side combine (see
    // HubStore.merge)
    val latestIds = sales
      .groupBy(col("플랜트"))
      .agg(max_by(col("ID"), struct(col("년"), col("월"))).as("ID"))
    val keys = claimKeys
      .withColumnRenamed("접수년", "년")
      .withColumnRenamed("접수월", "월")
    keys
      .join(broadcast(latestIds), Seq("플랜트"), "left")
      .na.fill("", Seq("ID"))
      .join(sales.drop("ID"), Seq("플랜트", "년", "월"), "left")
      .na.fill(0.0, Seq("매출수량"))
      .na.fill(false, Seq("is_estimated"))
      .orderBy("플랜트", "년", "월")
  }

  /** Distinct claim keys for sync (ref: core/storage.py:326-338 —
    * column-pruned hub scan).
    */
  def claimKeys(hub: DataFrame): DataFrame =
    hub.select(col("플랜트"), col("접수년"), col("접수월"))
      .filter(col("플랜트").isNotNull)
      .distinct()

  /** A9 — long → wide pivot by 년월 (ref: pages/2:100-125). */
  def longToPivot(sales: DataFrame): DataFrame = {
    val withYm = sales.withColumn("년월",
      concat(col("년").cast("string"), lit("-"), lpad(col("월").cast("string"), 2, "0")))
    val latestId = withYm
      .groupBy(col("플랜트"))
      .agg(max_by(col("ID"), col("년월")).as("ID"))
    withYm.groupBy("플랜트").pivot("년월").sum("매출수량")
      .na.fill(0.0)
      .join(broadcast(latestId), Seq("플랜트"), "left")
  }

  /** A10 — wide → long unpivot (ref: pages/2:127-145). */
  def pivotToLong(pivoted: DataFrame): DataFrame = {
    val ymCols = pivoted.columns.filterNot(Seq("ID", "플랜트").contains)
    val unp = pivoted.unpivot(
      Array(col("ID"), col("플랜트")),
      ymCols.map(col), "년월", "매출수량")
    unp
      .withColumn("년", expr("try_cast(split(`년월`, '-')[0] AS INT)"))
      .withColumn("월", expr("try_cast(split(`년월`, '-')[1] AS INT)"))
      .withColumn("is_estimated", lit(false))
      .select("ID", "플랜트", "년", "월", "매출수량", "is_estimated")
      .orderBy("플랜트", "년", "월")
  }

  /** J3 — PPM: monthly claim counts ⋈ sales on (플랜트,년,월);
    * PPM = 건수 / 매출수량 × 1,000,000, null-guarded
    * (ref: reports/phase2_adaptive_report.md:140-169).
    */
  def ppm(hub: DataFrame, sales: DataFrame): DataFrame = {
    val counts = hub
      .groupBy(col("플랜트"), col("접수년").as("년"), col("접수월").as("월"))
      .agg(count(lit(1)).as("건수"))
    counts
      .join(sales.select("플랜트", "년", "월", "매출수량"),
        Seq("플랜트", "년", "월"), "left")
      .withColumn("PPM",
        when(col("매출수량") > 0,
          round(col("건수") / col("매출수량") * 1e6, 2)))
      .orderBy("플랜트", "년", "월")
  }
}
