package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AnalyticsQueries, BpeQueries, CurationQueries,
  EventQueries, GraphQueries, HybridQueries, LinkageQueries, MlQueries,
  RelationalQueries, SketchQueries, TextQueries, TopicQueries,
  UnigramTokQueries, VectorQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-area modules; each entry mirrors one
  * operator row of SURVEY.md §2. `oracleSql` carries the DuckDB-runnable
  * equivalent for every SQL-expressible query (column aliases match the
  * Spark output exactly — the driver hashes values under sorted column
  * names).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    WindowQueries,
    EventQueries,
    SketchQueries,
    AnalyticsQueries,
    TextQueries,
    CurationQueries,
    VectorQueries,
    MlQueries,
    LinkageQueries,
    BpeQueries,
    GraphQueries,
    TopicQueries,
    UnigramTokQueries,
    HybridQueries
  )

  private lazy val allDefs: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    val dup = ds.groupBy(_.name).collect { case (n, xs) if xs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The risk scan is the reference's hot "Risk Radar" query
    * (SURVEY.md §7.3 minimum end-to-end slice).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_risk_scan")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
