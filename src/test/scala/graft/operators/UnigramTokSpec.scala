package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the unigram-LM tokenizer's hard-EM round on hand-computable
  * corpora: the Viterbi DP must prefer the whole-word piece exactly
  * when the fixed-point costs say so, single-char coverage must keep
  * every word segmentable, and the EM counts must conserve characters
  * (every word's pieces re-concatenate to the word, so
  * Σ em_count·len(piece) = Σ cnt·len(word) — the invariant the oracle
  * prototype verified corpus-wide).
  */
class UnigramTokSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def train(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    UnigramTokQueries.trainFrame(rows.toDF("w", "cnt")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("repeated-substring corpus: Viterbi adopts the whole-word piece") {
    // "abab"×7: seeds a=14, b=14, ab=14, ba=7, aba=7, bab=7, abab=7;
    // T = 70. cost(abab) = round(1e6·ln(10)) = 2302585 < 2·cost(ab) =
    // 2·round(1e6·ln(5)) = 3218876 — the single piece must win.
    val out = train(Seq(("abab", 7L)))
    assert(out("abab") === ((7L, 2302585L, 7L)))
    assert(out("ab")._3 === 0L, "ab must be unused (prune signal)")
    assert(out("a")._3 === 0L)
    // Character conservation: 7 words × 4 chars.
    assert(out.map { case (p, (_, _, em)) => em * p.length }.sum === 28L)
  }

  test("single-char coverage keeps rare words segmentable; chars conserve") {
    val out = train(Seq(("xyzq", 1L), ("xy", 50L)))
    // Conservation: 1×4 + 50×2 chars, however the DP splits them.
    assert(out.map { case (p, (_, _, em)) => em * p.length }.sum === 104L)
    // The dominant bigram is adopted for its own word.
    assert(out("xy")._3 >= 50L)
  }

  test("fixed-point costs: equal counts tie, rarer pieces cost more") {
    val out = train(Seq(("abab", 7L)))
    assert(out("a")._2 === out("b")._2)
    assert(out("abab")._2 > out("ab")._2)
    assert(out.values.forall(_._2 > 0L), "costs are positive (c < T)")
  }

  test("encode: per-doc piece counts from the DP, over-cap words skip") {
    // Corpus of two docs sharing the tokenizer fit: "abab" dominates
    // (3 occurrences), so its whole-word piece wins the Viterbi
    // (np = 1, the train-spec cost argument at these counts too);
    // the 13-char word exceeds MaxWordLen=12 and must count ONLY as
    // skipped — no pieces, no chars.
    import spark.implicits._
    val toks = Seq(
      (1L, "abab"), (1L, "abab"),
      (2L, "abab"), (2L, "aaaaaaaaaaaaa")).toDF("doc_id", "w")
    val out = UnigramTokQueries.encodeFrame(toks).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map(
      1L -> ((2L, 2L, 8L, 0L)),
      2L -> ((1L, 1L, 4L, 1L))))
  }

  test("words over the length cap are excluded, not truncated") {
    // A 13-char word exceeds MaxWordLen=12: it contributes NOTHING
    // (no seed counts, no segmentation) rather than a clipped prefix.
    val out = train(Seq(("aaaaaaaaaaaaa", 100L), ("bc", 1L)))
    assert(out.map { case (p, (_, _, em)) => em * p.length }.sum === 2L)
    assert(!out.keys.exists(_.startsWith("a")),
      s"over-cap word leaked into the vocab: ${out.keys}")
  }
}
