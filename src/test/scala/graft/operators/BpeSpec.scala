package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed BPE merge training (the q_bpe_merges kernel). */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("overlap, lexicographic tie-break, multi-char merges, exhaustion") {
    import spark.implicits._
    // aaa×5: (a,a) twice per word = 10; ab×4 + abab×3: (a,b) = 4+6 = 10,
    // (b,a) = 3. Round 1 ties (a,a)=10 with (a,b)=10 → pair-lexicographic
    // pick (a,a); GREEDY leftmost application turns aaa into [aa, a]
    // (NOT [a, aa], and the pair count 10 counts the overlap while the
    // merge consumes it once).
    val freq = Seq(("aaa", 5L), ("ab", 4L), ("abab", 3L)).toDF("w", "cnt")
    val merges = BpeQueries.trainMerges(freq, k = 6)
    assert(merges === Seq(
      (1, "a", "a", 10L),   // tie-break vs (a,b)
      (2, "a", "b", 10L),   // ab + abab(×2)
      (3, "aa", "a", 5L),   // the greedy remainder of aaa
      (4, "ab", "ab", 3L))) // abab's two merged halves
    // k=6 requested, 4 learned: exhaustion stops the loop early.
  }

  test("encode round-trips the trainer's own application") {
    import spark.implicits._
    // Replaying the learned rules over the same frequency classes must
    // reproduce the trainer's final segmentation: aaa → [aaa] (rule 1
    // then rule 3), ab → [ab], abab → [ab, ab] → [abab].
    val freq = Seq(("aaa", 5L), ("ab", 4L), ("abab", 3L)).toDF("w", "cnt")
    val merges = BpeQueries.trainMerges(freq, k = 6)
    val counts = BpeQueries.subwordCounts(freq, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("aaa" -> 5L, "ab" -> 4L, "abab" -> 3L))
  }

  test("wrapped-string replace is symbol-boundary safe") {
    import spark.implicits._
    // Round 1 merges (x,a)=11; xab becomes [xa, b]. Round 2 merges
    // (a,b)=6 — which must NOT fire inside [xa, b] even though the
    // character sequence "ab" appears across the symbol boundary.
    val freq = Seq(("xa", 10L), ("ab", 6L), ("xab", 1L)).toDF("w", "cnt")
    val merges = BpeQueries.trainMerges(freq, k = 4)
    assert(merges === Seq(
      (1, "x", "a", 11L),
      (2, "a", "b", 6L),
      (3, "xa", "b", 1L)))
  }
}
