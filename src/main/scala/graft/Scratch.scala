package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        val det = si.details.linesIterator.filter(_.contains("graft"))
          .take(2).mkString(" | ")
        stages += ((si.stageId, (si.name.take(40) + " :: " + det).take(200), ms, si.numTasks))
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/orders.parquet").count()
    stages.clear()
    val variant = args.headOption.getOrElse("full")
    val docs = Tables.documents(spark, d)
    import graft.text.DedupJobs
    val tBuild = System.nanoTime()
    val base = DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
      withAudit = variant != "kernel")
    println(f"BUILD=${(System.nanoTime() - tBuild) / 1e9}%.2f")
    val df = variant match {
      case "kernel" | "audit" => base
      case "filter" => base.filter(col("jaccard_check") < 0.5)
      case _ => base.filter(col("jaccard_check") < 0.5)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"), col("jaccard_check"))
        .orderBy("id_a", "id_b")
    }
    val t0 = System.nanoTime()
    val n = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"VARIANT=$variant WALL=$wall%.2f rows=$n stagesSum=${stages.map(_._3).sum / 1000.0}%.2f")
    stages.foreach { case (id, nm, ms, nt) => println(f"  stage $id%3d $ms%6d ms  $nt%3d tasks  $nm") }
    spark.stop()
  }
}
