package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full predicate-pushdown /
  * column-pruning freedom; callers `select`/`filter` and let the scan
  * shrink accordingly.
  */
object Tables {
  /** The DataFrame HANDLE (analyzed plan + resolved file index) is
    * memoized per (session, path); execution stays lazy — every action
    * still scans the files. Without this each query entry re-lists the
    * directory and re-reads parquet footers for schema inference
    * (~10–30 ms × tables × 70+ entries of pure metadata I/O; on a real
    * cluster the same role is played by the catalog's relation cache).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    SessionCache.getOrBuild(spark, s"table|$sfDir/$name.parquet") {
      (spark.read.parquet(s"$sfDir/$name.parquet"), Seq.empty)
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark has no native
    * type for; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * so it arrives as a long, converted here to a µs TIMESTAMP_NTZ
    * (the data has no sub-µs components; NTZ matches DuckDB's naive
    * timestamp semantics under the UTC session timezone).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    else raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
