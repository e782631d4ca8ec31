package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EwmaAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private def reference(xs: Seq[Double], alpha: Double): Double =
    xs.tail.foldLeft(xs.head)((e, x) => (1 - alpha) * e + alpha * x)

  test("SQL ewma equals the adjust=False recursion, invariant to row order") {
    import spark.implicits._
    EwmaAggregator.register(spark)
    val rnd = new scala.util.Random(11)
    val series = (0 until 5).map { g =>
      g -> (0 until (3 + rnd.nextInt(40))).map(_ => rnd.nextDouble() * 20)
    }
    val rows = for {
      (g, xs) <- series
      (x, i) <- xs.zipWithIndex
    } yield (g, i.toLong, x)
    // shuffled input order + forced repartition: the aggregator must
    // resolve the (group, ord) order itself
    rnd.shuffle(rows).toDF("g", "ord", "x")
      .repartition(7)
      .createOrReplaceTempView("series")
    val got = spark
      .sql("SELECT g, ewma(ord, x, 0.2) AS e FROM series GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    series.foreach { case (g, xs) =>
      assert(math.abs(got(g) - reference(xs, 0.2)) < 1e-9,
        s"group $g: ${got(g)} vs ${reference(xs, 0.2)}")
    }
  }
}
