package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: `entry` must run in a BARE SparkSession — the
  * driver's own smoke session carries none of our configs (no
  * nanosAsLong, ANSI at Spark 4 default), so `entry` must not depend on
  * them.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("entry returns rows in a bare default session") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      assert(SparkEntry.entry(spark).count() > 0)
    } finally spark.stop()
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
