package graft
import org.apache.spark.sql.SparkSession
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = sys.env.getOrElse("GRAFT_RUNONE_REPS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Warmup.run(spark, sfDir)
    val show = sys.env.get("GRAFT_RUNONE_SHOW").contains("1")
    for (name <- args.drop(1); rep <- 1 to reps) {
      val t0 = System.nanoTime()
      // noop write = the same materialization Bench times.
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"$name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (show && rep == reps)
        SparkEntry.queries(name)(spark, sfDir).show(50, false)
    }
    spark.stop()
  }
}
