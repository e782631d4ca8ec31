package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time named queries with the BENCH methodology (noop
  * sink — materializes every row and column; `count()` lies for
  * aggregate-heavy plans, see Bench.scala) without running the whole
  * suite. Prints per-rep seconds so warm/cold structure is visible.
  * Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.TimeQueries <sfDir> <reps> [q ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    Warmup.run(spark, sfDir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[time] $name: UNKNOWN")
        case Some(fn) =>
          val ts = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            catch { case e: Throwable =>
              println(s"[time] $name FAILED: ${e.getMessage}") }
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[time] $name%-28s " +
            ts.map(t => f"$t%.2f").mkString(" ") +
            f"  min=${ts.min}%.2f")
      }
    }
    spark.stop()
  }
}
