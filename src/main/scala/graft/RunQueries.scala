package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run named queries (or all, with no names) against a
  * scale-factor dir and print wall time + row count for each. Usage:
  *   runMain graft.RunQueries <sfDir> [queryName ...]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Allow shuffled-hash joins where the planner's size conditions
      // fit (measured 5-12% on the join-heavy graph
      // entries): sort-merge stays the fallback, AQE still upgrades
      // small sides to broadcast — this only removes the blanket
      // prefer-sort bias, it is not a local-core-count tune.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup; the only expected failure is a missing/foreign sfDir
    // (AnalysisException: PATH_NOT_FOUND) — anything else should surface.
    Warmup.run(spark, sfDir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            val n = df.count()
            println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $n rows")
            if (sys.env.contains("SPARK_GRAFT_SHOW") && n <= 30) df.show(30, false)
          } catch {
            case e: Throwable =>
              println(s"$name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
