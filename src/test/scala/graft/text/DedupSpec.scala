package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private def docs() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the evening comes and the stars appear in the sky"
    val nearDup = base.replace("quick", "speedy") // one word differs
    val distinct1 = "completely different content about spark catalyst " +
      "optimizer rules and physical execution strategies for joins"
    val distinct2 = "a third unrelated document mentioning parquet column " +
      "pruning predicate pushdown and shuffle partitions tuning"
    Seq(
      (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2),
      (4L, base) // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val g = DedupJobs.exactDupGroups(docs(), "doc_id", "text")
    val dup = g.filter(col("n_docs") > 1).collect()
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("keep_id") == 0L)
    assert(dup(0).getAs[Long]("n_docs") == 2L)
  }

  test("minhash LSH finds near-duplicate pair and not distinct docs") {
    val pairs = DedupJobs.minhashCandidatePairs(
      docs(), "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"near-dup pair missing; got $pairs")
    assert(pairs.contains((0L, 4L)), s"exact-dup pair missing; got $pairs")
    assert(!pairs.contains((2L, 3L)), s"false positive; got $pairs")
  }

  test("minhash dup groups map near-dups to one survivor") {
    val g = DedupJobs.minhashDupGroups(docs(), "doc_id", "text", threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(0L) == 0L && g(1L) == 0L && g(4L) == 0L)
    assert(g(2L) == 2L && g(3L) == 3L)
  }

  test("simhash near-dups within hamming distance") {
    val pairs = DedupJobs.simhashNearDups(docs(), "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)), s"exact dup must have hamming 0; got $pairs")
    assert(pairs.contains((0L, 1L)), s"near dup expected within 8 bits; got $pairs")
  }

  test("simhash degenerate block stays bounded under maxBucket cap") {
    import spark.implicits._
    // All-identical texts: every doc lands in the same 4 block buckets.
    // Uncapped this is m²/2 pairs from one bucket — the cap must bound
    // the output (cap exceeded → bucket dropped entirely), and a
    // permissive cap must return exactly the all-pairs set.
    val same = (0L until 20L).map(i => (i, "identical text repeated here"))
      .toDF("doc_id", "text")
    val capped = DedupJobs.simhashNearDups(same, "doc_id", "text",
      maxHamming = 3, maxBucket = 5).count()
    assert(capped == 0L, "over-cap degenerate buckets must be dropped")
    val open = DedupJobs.simhashNearDups(same, "doc_id", "text",
      maxHamming = 3, maxBucket = 1000).count()
    assert(open == 190L, s"20 identical docs → C(20,2)=190 pairs, got $open")
  }

  test("ngram jaccard with tiny broadcast blocks equals single-block result") {
    import spark.implicits._
    val blocked = docs().withColumn("lang", lit("en"))
    def run(blockSize: Int) = DedupJobs.ngramJaccardPairs(blocked, "doc_id",
      "text", Seq("lang"), n = 2, threshold = 0.5,
      broadcastBlockSize = blockSize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(2) == run(1000))
    assert(run(2).nonEmpty)
  }

  test("cosine near-dup with tiny broadcast blocks equals single-block result") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.98f, 0.2f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    def run(blockSize: Int) = graft.vector.VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", 0.9, broadcastBlockSize = blockSize)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(2) == run(1000))
    assert(run(2) == Set((0L, 1L), (2L, 3L)))
  }

  test("ngram jaccard pairs verify blocked near-dups") {
    import spark.implicits._
    val blocked = docs().withColumn("lang", lit("en"))
    val pairs = DedupJobs.ngramJaccardPairs(blocked, "doc_id", "text",
      Seq("lang"), n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 4L)))
    assert(!pairs.contains((2L, 3L)))
  }
}
