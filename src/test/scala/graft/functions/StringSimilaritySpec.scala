package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Jaro-Winkler expression: canonical values probed bit-for-bit from
  * the oracle engine (these pin the VARIANT — floored half
  * transpositions, 0.7 boost threshold, 4-byte prefix cap, byte-based
  * distances, empty→0.0), plus property invariants and the SQL /
  * codegen paths. The q_fuzzy_jaro driver entry re-checks parity over
  * every blocked candidate pair of the real tables.
  */
class StringSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical oracle-engine values, bit-exact") {
    // Probed from the oracle engine (jaro_winkler_similarity) — see
    // the scaladoc; exact double equality on purpose.
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    // jaro 0.51 < 0.7: the 3-byte common prefix earns NO boost.
    assert(jw("ABCXXXXXXX", "ABCYYYYYYYYYY") == 0.5102564102564102)
    // 6-byte common prefix: the boost caps at 4.
    assert(jw("PREFIXaaaa", "PREFIXbbbb") == 0.8400000000000001)
    assert(jw("goldenrod lavender spring chocolate lace",
      "goldenrod lavender spring chocolate late") == 0.99)
    // BYTE-based, not code-point-based: ü is two UTF-8 bytes.
    assert(jw("Müller", "Muller") == 0.8642857142857143)
  }

  test("edge conventions: empty strings and self-similarity") {
    assert(jw("", "") == 0.0, "both-empty is 0.0 in the oracle engine")
    assert(jw("", "a") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("abcdefgh", "abcdefgh") == 1.0)
    assert(jw("ab", "cd") == 0.0)
  }

  test("properties: symmetry and range over random strings") {
    val rnd = new scala.util.Random(13)
    def s(): String = {
      val n = rnd.nextInt(15)
      Array.fill(n)(('a' + rnd.nextInt(8)).toChar).mkString
    }
    for (_ <- 0 until 2000) {
      val (a, b) = (s(), s())
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0, s"out of range: '$a' '$b' -> $x")
      assert(jw(b, a) == x, s"asymmetric: '$a' '$b'")
      // The equality fast-path must agree with the full algorithm's
      // answer for identical strings (oracle-fuzzed at exactly 1.0).
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"self-sim not 1.0: '$a'")
    }
  }

  test("codegen path equals interpreted eval on a DataFrame") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def s(): String = {
      val n = rnd.nextInt(12)
      Array.fill(n)(('a' + rnd.nextInt(6)).toChar).mkString
    }
    val rows = (0 until 300).map(i => (i, s(), s()))
    val df = rows.toDF("id", "a", "b")
    // The DataFrame run goes through whole-stage codegen; compare to
    // direct kernel calls (the interpreted/eval reference).
    val got = df.select(col("id"),
        StringSimilarity.jaro_winkler(col("a"), col("b")).as("x"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (i, a, b) =>
      assert(got(i) == jw(a, b), s"codegen drift on '$a' '$b'")
    }
  }

  test("registers as a SQL function and coerces inputs") {
    StringSimilarity.register(spark)
    val x = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS x")
      .collect()(0).getDouble(0)
    assert(x == 0.9611111111111111)
    // Non-string inputs coerce through cast.
    val y = spark.sql("SELECT jaro_winkler(12345, 12354) AS x")
      .collect()(0).getDouble(0)
    assert(y == jw("12345", "12354"))
    // Null propagates.
    assert(spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'a') AS x")
      .collect()(0).isNullAt(0))
  }
}
