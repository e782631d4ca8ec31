package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch sweep for the ANN recall floors (round-10 tuning): recall@10
  * of LSH (by probeRadius) and IVF (by nprobe) vs brute force, per SF.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.vector.{IvfIndex, VectorOps}
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"$base/$sf"
      val emb = Tables.embeddings(spark, d)
      val dim = emb.select(size(col("embedding"))).first().getInt(0)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      val exact = VectorOps.topKCosine(emb, q, "vec_id", "embedding", k = 10)
        .select("vec_id").persist()
      exact.count()
      def recall(approx: org.apache.spark.sql.DataFrame): Double =
        exact.join(approx.select("vec_id"), Seq("vec_id"), "left_semi")
          .count() / 10.0
      for (r <- Seq(2, 3)) {
        val lsh = VectorOps.annTopKCosine(emb, q, "vec_id", "embedding",
          k = 10, dim = dim, probeRadius = r)
        println(s"$sf lsh r=$r recall=${recall(lsh)}")
      }
      val (assigned, cents) = IvfIndex.assignCached(emb, "vec_id",
        "embedding", k = 16, datasetKey = d)
      for (np <- Seq(6, 8, 10, 12)) {
        val ivf = IvfIndex.topK(assigned, cents, q, "vec_id", "embedding",
          k = 10, nprobe = np)
        println(s"$sf ivf nprobe=$np recall=${recall(ivf)}")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
