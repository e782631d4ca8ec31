package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native dot-product expression: value parity with the higher-order
  * Column formulation (the independent reference path), null/length
  * edge handling, and SQL registration. Runs over enough rows that the
  * codegen path (not just interpreted eval) is exercised.
  */
class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  test("matches the aggregate/zip_with formulation on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextDouble() * 2 - 1),
        Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val diff = df.select(
        abs(VectorExpressions.vec_dot(col("a"), col("b")) - hof).as("d"))
      .agg(max("d")).collect()(0).getDouble(0)
    assert(diff < 1e-12, s"max |native - hof| = $diff")
  }

  test("edge cases: empty, length mismatch, null element, null array") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.empty[Double], Array.empty[Double]),
      (2L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0)) // shorter wins
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorExpressions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == 1.0 * 4 + 2.0 * 5)
    val withNulls = spark.sql(
      "SELECT array(1.0d, CAST(NULL AS DOUBLE), 3.0d) AS a, array(2.0d, 9.0d, 4.0d) AS b")
    val d = withNulls.select(
      VectorExpressions.vec_dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(d == 1.0 * 2 + 3.0 * 4, "null elements contribute 0")
    val nullArr = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0d) AS b")
    assert(nullArr.select(VectorExpressions.vec_dot(col("a"), col("b")))
      .collect()(0).isNullAt(0), "null array input gives null")
  }

  test("registers as a SQL function") {
    VectorExpressions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
  }
}
