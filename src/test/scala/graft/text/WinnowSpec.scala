package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing guarantee (Schleimer et al.): documents sharing a token
  * run of length ≥ winnow+window−1 share at least one fingerprint;
  * unrelated documents share none.
  */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("shared long runs produce shared fingerprints; disjoint docs none") {
    import spark.implicits._
    val sharedRun = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"unique one two three $sharedRun tail words here"),
      (2L, s"$sharedRun completely different continuation tokens"),
      (3L, "nothing in common with the others at all whatsoever today"))
      .toDF("doc_id", "text")
    val fp = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("t"), window = 4, winnow = 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty, "10-token shared run must collide")
    assert(fp(1L).intersect(fp(3L)).isEmpty)
    assert(fp(2L).intersect(fp(3L)).isEmpty)
  }

  test("guarantee holds at every offset: minimal shared run always collides") {
    import spark.implicits._
    // Schleimer guarantee: a shared run of ≥ winnow+window−1 tokens
    // (= 7 here) yields a shared fingerprint REGARDLESS of where the
    // run sits in each document. Tiling (advancing the selection window
    // by `winnow` instead of sliding by 1) breaks exactly this: the
    // run's windows land at different absolute offsets per doc and can
    // select different minima. Try every alignment 0..7.
    val run = "alpha beta gamma delta epsilon zeta eta" // 7 tokens
    val filler = Vector("red", "blue", "green", "cyan", "pink", "grey", "teal", "gold")
    val base = (100L, s"$run ${filler.mkString(" ")}")
    val shifted = (0 to 7).map { off =>
      (off.toLong, s"${filler.take(off).mkString(" ")} $run ${filler.drop(off).mkString(" ")}".trim)
    }
    val docs = (base +: shifted).toDF("doc_id", "text")
    val fp = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("t"), window = 4, winnow = 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    (0 to 7).foreach { off =>
      assert(fp(100L).intersect(fp(off.toLong)).nonEmpty,
        s"offset $off: shared 7-token run selected no common fingerprint")
    }
  }

  test("fingerprints are deterministic and non-empty for short docs") {
    import spark.implicits._
    val docs = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    def run() = docs
      .select(TextFunctions.winnowFingerprints(
        TextFunctions.tokens(col("text"))).as("fps"))
      .collect()(0).getSeq[Long](0)
    assert(run() == run())
    assert(run().nonEmpty)
  }
}
