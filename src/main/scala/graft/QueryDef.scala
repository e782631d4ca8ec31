package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle SQL over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
