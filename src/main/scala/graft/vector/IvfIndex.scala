package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer scale path (Jégou et al., public IVF/IVFADC
  * family): k-means centroids partition the corpus; a query probes only
  * the `nprobe` nearest cells. At 100 TB the corpus is written
  * partitioned by cell, so a probe reads `nprobe/k` of the data; here
  * the cell assignment and probing run in one session.
  */
object IvfIndex {

  /** Assign each vector to its nearest of `k` centroids (seeded k-means
    * → deterministic locally).
    */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    val feat = vectors.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed)
      .setMaxIter(10) // coarse quantizer — convergence beyond this buys no recall
      .setFeaturesCol("__features").fit(feat)
    val assigned = model.transform(feat)
      .withColumnRenamed("prediction", "cell")
      .drop("__features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Top-k cosine restricted to the `nprobe` cells nearest the query. */
  def topK(assigned: DataFrame, centroids: Array[Array[Double]],
      query: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val centroidDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    val probeCells = query.crossJoin(broadcast(centroidDf))
      .withColumn("dist",
        VectorOps.dot(col("qvec").cast("array<double>"), col("centroid")) * -1)
      .orderBy(col("dist"), col("cell"))
      .limit(nprobe)
      .select(col("cell"))
    assigned
      .join(broadcast(probeCells), Seq("cell"))
      .crossJoin(broadcast(query))
      .select(col(idCol),
        round(VectorOps.cosine(col(vecCol).cast("array<double>"),
          col("qvec").cast("array<double>")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
