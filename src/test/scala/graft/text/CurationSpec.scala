package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  test("repetition metrics flag degenerate text and pass varied text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spam spam spam spam spam spam"),       // one bigram repeated 5x
      (1L, "all five bigrams here are unique ok"), // no repeats
      (2L, "one"),                                 // < 2 tokens: no grams
      (3L, "go go stop go go stop go go")          // mixed repeats
    ).toDF("doc_id", "text")
    val m = CurationOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Double]("top_gram_frac") == 1.0)
    assert(m(0L).getAs[Double]("dup_gram_frac") == 1.0)
    assert(!m(0L).getAs[Boolean]("pass_repetition"))
    assert(m(1L).getAs[Double]("dup_gram_frac") == 0.0)
    assert(m(1L).getAs[Boolean]("pass_repetition"))
    assert(m(2L).getAs[Long]("n_grams") == 0L)
    assert(m(2L).getAs[Boolean]("pass_repetition"))
    // "go go stop go go stop go go": 7 bigrams, "go go" 3x, "go stop" 2x,
    // "stop go" 2x -> top 3/7, dup 7/7
    assert(m(3L).getAs[Long]("n_grams") == 7L)
    assert(m(3L).getAs[Double]("top_gram_frac") == math.rint(3.0 / 7 * 1e4) / 1e4)
    assert(m(3L).getAs[Double]("dup_gram_frac") == 1.0)
  }

  test("contamination finds planted benchmark overlap and nothing else") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the capital of france is paris and the seine flows through")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "trivia dump the capital of france is paris obviously"), // 5-token overlap run
      (1L, "entirely unrelated text about catalyst shuffle planning"),
      (2L, "the capital of france is paris and the seine flows through") // verbatim copy
    ).toDF("doc_id", "text")
    val c = CurationOps.contamination(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(c(2L).getAs[Double]("contamination") == 1.0)
    assert(c(2L).getAs[Boolean]("contaminated"))
    assert(c(1L).getAs[Long]("n_hits") == 0L)
    assert(!c(1L).getAs[Boolean]("contaminated"))
    // doc 0's overlap run "the capital of france is paris" yields 4
    // shared trigrams (the capital of / capital of france / of france
    // is / france is paris)
    assert(c(0L).getAs[Long]("n_hits") == 4L)
  }

  test("scrub counts and redacts emails and digit runs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "contact alice.smith+dev@example.co.uk or bob@test.org now"),
      (1L, "order 12345 shipped 2024 items 7"),
      (2L, "no sensitive content here")
    ).toDF("doc_id", "text")
    val m = CurationOps.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_emails") == 2L)
    assert(m(1L).getAs[Long]("n_numbers") == 3L)
    assert(m(2L).getAs[Long]("n_emails") == 0L &&
      m(2L).getAs[Long]("n_numbers") == 0L)
    // redacted fingerprints: doc 1 must hash the <NUM>-substituted text,
    // doc 2 the original
    val expected1 = java.security.MessageDigest.getInstance("MD5")
      .digest("order <NUM> shipped <NUM> items <NUM>".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(m(1L).getAs[String]("redacted_fp") == expected1)
  }

  test("temperature mix flattens toward the tail and conserves mass") {
    import spark.implicits._
    val docs = (0 until 90).map(i => (i.toLong, "x", "big")) ++
      (0 until 10).map(i => (100L + i, "x", "small"))
    val df = docs.toDF("doc_id", "text", "source")
    val m = CurationOps.temperatureMix(df, "source", alpha = 0.5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // sqrt(90)/(sqrt(90)+sqrt(10)) = 0.75, sqrt(10)/... = 0.25
    assert(m("big").getAs[Double]("weight") == 0.75)
    assert(m("small").getAs[Double]("weight") == 0.25)
    // tail stratum up-weighted above its natural share, head below
    assert(m("small").getAs[Double]("sampling_rate") > 1.0)
    assert(m("big").getAs[Double]("sampling_rate") < 1.0)
    // weights sum to 1
    val wSum = m.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-9)
  }
}
