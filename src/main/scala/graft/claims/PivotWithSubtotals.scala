package graft.claims

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A11 — dynamic pivot with subtotal / total label rows
  * (ref: pages/3_플랜트_분석.py:270-317
  * `create_pivot_with_subtotals_dynamic`):
  *
  *  - months become columns (explicit month list → zero fill)
  *  - n=1 index level: data rows + one 'Total' grand row
  *  - n=2: per-level-1 '전체 합계' rows + grand 'Total' row
  *  - n≥3: per-level-2 '소계' rows, per-level-1 '전체 합계' rows
  *    (remaining levels blanked to ''), grand 'Total' row
  *  - right-hand 'Total' column = row sum over the month columns
  *
  * Spark shape: ONE grouping-sets pass (rollup) + pivot — the reference
  * loops and concatenates per group; here Catalyst computes every
  * subtotal level in the same shuffle.
  */
object PivotWithSubtotals {

  def build(df: DataFrame, indices: Seq[String], monthCol: String,
      allMonths: Seq[String]): DataFrame = {
    require(indices.nonEmpty)
    val n = indices.length

    // month columns via conditional aggregation in the SAME rollup pass
    // (Spark does not allow pivot after rollup); grouping() flags give
    // the exact subtotal level, robust against null data values.
    val monthAggs = allMonths.map(m =>
      count(when(col(monthCol).cast("string") === m, 1)).as(m))
    val gAggs = indices.map(c => grouping(col(c)).as(s"__g_$c"))
    val aggs = monthAggs ++ gAggs
    val rolled = df
      .rollup(indices.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    val levelCol = indices.map(c => col(s"__g_$c").cast("int")).reduce(_ + _)
    val labeled0 = rolled.withColumn("__lvl", levelCol)
      .drop(indices.map(c => s"__g_$c"): _*)

    // keep only the grouping levels the reference emits:
    //  lvl 0 data rows; lvl n−2 → '소계' (n≥3); lvl n−1 → '전체 합계'
    //  (n≥2); lvl n → grand 'Total'
    val keptLevels =
      (Seq(0, n) ++ (if (n >= 2) Seq(n - 1) else Nil) ++
        (if (n >= 3) Seq(n - 2) else Nil)).distinct
    val kept = labeled0.filter(col("__lvl").isin(keptLevels.map(Integer.valueOf): _*))

    // labels at fixed index positions: 'Total'@0, '전체 합계'@1, '소계'@2,
    // deeper positions blanked (ref idx_parts construction)
    val relabeled = indices.zipWithIndex.foldLeft(kept) { case (acc, (c, i)) =>
      acc.withColumn(c,
        when(col("__lvl") === n,
          if (i == 0) lit("Total") else lit(""))
          .when(col("__lvl") === (n - 1) && lit(n >= 2),
            if (i == 1) lit("전체 합계") else if (i > 1) lit("") else col(c))
          .when(col("__lvl") === (n - 2) && lit(n >= 3),
            if (i == 2) lit("소계") else if (i > 2) lit("") else col(c))
          .otherwise(col(c)))
    }

    val totalCol = allMonths.map(m => col(m)).reduce(_ + _)
    relabeled
      .withColumn("Total", totalCol)
      .drop("__lvl")
      .orderBy(indices.map(col): _*)
  }
}
