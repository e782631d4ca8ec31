package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TailProbabilitiesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("poisson_tail matches the engine kernel through SQL and Column") {
    TailProbabilities.register(spark)
    import spark.implicits._
    val df = Seq((3.0, 1.5), (1.0, 0.2), (10.0, 2.0)).toDF("k", "mu")
    val viaColumn = df
      .select(TailProbabilities.poisson_tail(col("k"), col("mu")).as("p"))
      .collect().map(_.getDouble(0))
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT poisson_tail(k, mu) AS p FROM t")
      .collect().map(_.getDouble(0))
    val expected = Seq((3.0, 1.5), (1.0, 0.2), (10.0, 2.0))
      .map { case (k, mu) => TailProbabilities.upperTail(k, mu) }
    assert(viaColumn.toSeq == expected)
    assert(viaSql.toSeq == expected)
    // sanity: tail of k=1 at mu=0.2 is P(X>=1) = 1 - e^-0.2
    assert(math.abs(expected(1) - (1 - math.exp(-0.2))) < 1e-12)
  }

  test("negbin_tail via SQL matches the kernel") {
    TailProbabilities.register(spark)
    val p = spark.sql("SELECT negbin_tail(4.0, 2.0, 5.0) AS p")
      .collect()(0).getDouble(0)
    assert(math.abs(p - TailProbabilities.negbinUpperTail(4.0, 2.0, 5.0)) < 1e-15)
    assert(p > 0 && p < 1)
  }

  test("whole-stage codegen path evaluates (non-fallback)") {
    // run over enough rows that codegen compiles the expression
    import spark.implicits._
    val df = spark.range(1000)
      .select((col("id") % 10).cast("double").as("k"), lit(2.0).as("mu"))
    val s = df.select(sum(TailProbabilities.poisson_tail(col("k"), col("mu"))))
      .collect()(0).getDouble(0)
    assert(s > 0)
  }
}
