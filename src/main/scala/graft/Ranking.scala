package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking without a single-partition window
  * over data — the two-level scheme shared by the global-rank,
  * sorted-neighborhood, and training-order operators.
  *
  * Level 1 ranks rows WITHIN each `bucketCol` group (a window keyed by
  * `partCols :+ bucketCol` — fully parallel, one hash shuffle). Level 2
  * computes each bucket's exclusive prefix count on the per-bucket
  * histogram — the only frame that crosses a single-partition window,
  * sized |buckets| (per partition), never |rows| — and broadcasts it
  * back. `out = offset + within-bucket rank` equals the exact global
  * `row_number() OVER (PARTITION BY partCols ORDER BY …)` provided:
  *
  *  - bucket ordering is CONSISTENT with the row ordering (the bucket
  *    is the leading sort key itself, or a prefix/coarsening of it:
  *    all rows of a lesser bucket sort before all rows of a greater
  *    one), and
  *  - `tieCols` make the within-bucket ordering total (unique key).
  *
  * At 100 TB the same plan holds whenever the histogram stays
  * broadcast-small — coarsen `bucketCol` (range bin, key prefix)
  * when the key's distinct count outgrows it; only the histogram must
  * stay small, never the data.
  */
object Ranking {

  def twoLevelRank(df: DataFrame, partCols: Seq[String], bucketCol: String,
      bucketAsc: Boolean, tieCols: Seq[String], out: String): DataFrame = {
    val keyCols = partCols :+ bucketCol
    val bktOrd: Column =
      if (bucketAsc) col(bucketCol).asc else col(bucketCol).desc
    val wOff = (if (partCols.isEmpty) Window.orderBy(bktOrd)
      else Window.partitionBy(partCols.map(col): _*).orderBy(bktOrd))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .drop("__cnt")
    val wRank = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tieCols.map(col): _*)
    // Null-safe key equality: groupBy keeps a null-bucket group, and a
    // plain equi-join would silently drop those rows from the ranking
    // (null keys never match). Null buckets order by Spark's window
    // null placement — FIRST ascending, LAST descending.
    val offAliased = offsets.select(
      keyCols.map(c => col(c).as(s"__k_$c")) :+ col("__off"): _*)
    val joinCond = keyCols.map(c => col(c) <=> col(s"__k_$c"))
      .reduce(_ && _)
    df.withColumn("__rk", row_number().over(wRank))
      .join(broadcast(offAliased), joinCond)
      .withColumn(out, col("__off") + col("__rk"))
      .drop(keyCols.map("__k_" + _) :+ "__off" :+ "__rk": _*)
  }

  /** The same two-level scheme generalized from counts to sums: the
    * EXCLUSIVE running sum of `valCol` in (`partCols`, bucket,
    * `tieCols`) order — `out` = sum of `valCol` over all strictly
    * preceding rows. Level 1 sums within each bucket (parallel window
    * keyed by `partCols :+ bucketCol`); level 2 prefix-sums the
    * per-bucket totals on the histogram frame (|buckets| rows, never
    * |rows|) and broadcasts the exclusive bucket offsets back. Equals
    * the single-partition `sum() OVER (ORDER BY … ROWS UNBOUNDED
    * PRECEDING TO 1 PRECEDING)` under the same two contract clauses as
    * [[twoLevelRank]]: bucket ordering consistent with row ordering,
    * and `tieCols` total. Null `valCol` rows contribute nothing, as in
    * the window form.
    */
  def twoLevelPrefixSum(df: DataFrame, partCols: Seq[String],
      bucketCol: String, bucketAsc: Boolean, tieCols: Seq[String],
      valCol: String, out: String): DataFrame = {
    val keyCols = partCols :+ bucketCol
    val bktOrd: Column =
      if (bucketAsc) col(bucketCol).asc else col(bucketCol).desc
    val wOff = (if (partCols.isEmpty) Window.orderBy(bktOrd)
      else Window.partitionBy(partCols.map(col): _*).orderBy(bktOrd))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valCol)).as("__sum"))
      .withColumn("__off", coalesce(sum("__sum").over(wOff), lit(0L)))
      .drop("__sum")
    val wCum = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offAliased = offsets.select(
      keyCols.map(c => col(c).as(s"__k_$c")) :+ col("__off"): _*)
    val joinCond = keyCols.map(c => col(c) <=> col(s"__k_$c"))
      .reduce(_ && _)
    df.withColumn("__cum", coalesce(sum(col(valCol)).over(wCum), lit(0L)))
      .join(broadcast(offAliased), joinCond)
      .withColumn(out, col("__off") + col("__cum"))
      .drop(keyCols.map("__k_" + _) :+ "__off" :+ "__cum": _*)
  }
}
