package graft
import org.apache.spark.sql.SparkSession
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Warmup.run(spark, sfDir)
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.collect()
      println(f"$name: ${rows.length} rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
      rows.take(5).foreach(r => println("  " + r))
    }
    spark.stop()
  }
}
