package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — a single scan with codegen'd
  * array arithmetic (`zip_with`/`aggregate`), no UDF. Scale path:
  * random-hyperplane LSH bucketing — signatures are computed map-side
  * against a broadcast hyperplane set; candidate generation touches
  * only same-bucket vectors, so the 100 TB corpus shuffles
  * (id, bucket) pairs instead of n² distances.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ for two numeric arrays (double out). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k against one query vector (given as a
    * 1-row DataFrame with `qvec`): scan → score → TakeOrdered(k).
    * Deterministic tie-break on id.
    */
  def topKCosine(vectors: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    vectors
      .crossJoin(broadcast(query))
      .select(col(idCol),
        round(cosine(col(vecCol).cast("array<double>"),
          col("qvec").cast("array<double>")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes: component h(p, i) derived
    * from xxhash64(p, i) scaled to [-1, 1). Fully plan-side — no RNG
    * state, reproducible across runs and engines.
    */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int): Column =
    transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(vec.cast("array<double>"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => (xxhash64(p, i).cast("double") / lit(Long.MaxValue.toDouble))),
          (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    })

  /** LSH bucket key: the sign pattern packed to a long. */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column =
    aggregate(
      zip_with(hyperplaneSignature(vec, dim, planes),
        sequence(lit(0), lit(planes - 1)),
        (b, i) => call_function("shiftleft", b.cast("long"), i)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

  /** ANN top-k via LSH: query and corpus bucketed by hyperplane signs;
    * only same-bucket vectors are scored. Falls back to fewer
    * candidates when the bucket is small — the standard recall/cost
    * trade (IVF/LSH family).
    */
  def annTopKCosine(vectors: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      planes: Int = 8): DataFrame = {
    val bucketed = vectors.withColumn("bucket", lshBucket(col(vecCol), dim, planes))
    val qb = query.withColumn("qbucket", lshBucket(col("qvec"), dim, planes))
    bucketed
      .join(broadcast(qb), col("bucket") === col("qbucket"))
      .select(col(idCol),
        round(cosine(col(vecCol).cast("array<double>"),
          col("qvec").cast("array<double>")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
