package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batched probes (round 12): per query, the batch path must
  * return exactly what the single-query probe returns — both pairs
  * share their cell-ranking / Hamming-ball code, and this spec pins
  * that the shared kernels actually keep the two access patterns at
  * the same operating point. Null query vectors are excluded, not
  * dereferenced (the library-wide null-embedding convention).
  */
class BatchProbeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dim = 8

  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  /** Query block: corpus vectors 3/17/29 plus one NULL vector. */
  private def queries: DataFrame = {
    import spark.implicits._
    Seq(3L, 17L, 29L).map { i =>
      val rnd = new scala.util.Random(i.toInt)
      (i, Seq.fill(dim)(rnd.nextGaussian()))
    }.toDF("query_id", "qvec")
      .unionByName(Seq(999L).toDF("query_id")
        .select(col("query_id"),
          lit(null).cast("array<double>").as("qvec")))
  }

  private def oneQuery(id: Long): DataFrame =
    queries.filter(col("query_id") === id).select("qvec")

  test("IVF: batch probe ≡ single-query probe per query; null qvec excluded") {
    val (assigned, cs) =
      IvfIndex.assign(corpus(300), "vec_id", "embedding", k = 6)
    val batch = IvfIndex.topKBatch(assigned, cs, queries,
      "vec_id", "embedding", k = 5, nprobe = 3)
      .select("query_id", "vec_id", "cos_sim").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet)
      .toMap
    assert(batch.keySet == Set(3L, 17L, 29L),
      s"three real queries answered, the null one excluded: ${batch.keySet}")
    for (qid <- Seq(3L, 17L, 29L)) {
      val single = IvfIndex.topK(assigned, cs, oneQuery(qid),
        "vec_id", "embedding", k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single,
        s"query $qid: batch ${batch(qid)} vs single $single")
    }
  }

  test("LSH: batch probe ≡ point probe per query; null qvec excluded") {
    val dir = java.nio.file.Files.createTempDirectory("lshb").toString + "/ix"
    val index = VectorOps.lshIndexLoadOrBuild(corpus(300),
      "vec_id", "embedding", dim, dir)
    val batch = VectorOps.annTopKCosineBatch(index, queries,
      "vec_id", "embedding", k = 5, dim = dim)
      .select("query_id", "vec_id", "cos_sim").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet)
      .toMap
    assert(batch.keySet == Set(3L, 17L, 29L),
      s"three real queries answered, the null one excluded: ${batch.keySet}")
    for (qid <- Seq(3L, 17L, 29L)) {
      val single = VectorOps.annTopKCosineIndexed(index, oneQuery(qid),
        "vec_id", "embedding", k = 5, dim = dim)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single,
        s"query $qid: batch ${batch(qid)} vs single $single")
    }
  }
}
