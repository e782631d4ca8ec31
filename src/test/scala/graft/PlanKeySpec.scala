package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cache-identity contract behind every session-cached search
  * artifact: equal inputs share a key, DIFFERENT inputs never do —
  * including the two shapes where a plan's tree string alone is blind
  * (LocalRelation rows; file relations whose string omits paths, the
  * warmup-vs-entry collision a round-9 cut actually hit).
  */
class PlanKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("same frame and structurally-equal frames agree") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(PlanKey.of(df) == PlanKey.of(df))
    val again = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(PlanKey.of(df) == PlanKey.of(again),
      "equal local data + schema must share the cache identity")
  }

  test("same-schema LocalRelations with different rows get different keys") {
    import spark.implicits._
    val a = Seq((1L, "a")).toDF("id", "t")
    val b = Seq((2L, "b")).toDF("id", "t")
    assert(PlanKey.of(a) != PlanKey.of(b),
      "tree strings print only the schema here — the data term must " +
        "discriminate")
  }

  test("same-schema scans of different directories get different keys") {
    val a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(PlanKey.of(a) != PlanKey.of(b),
      "the warmup sibling-dir scan must never share the entry's key")
    assert(PlanKey.of(a) == PlanKey.of(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")))
  }

  test("a filter changes the key") {
    import org.apache.spark.sql.functions.col
    val a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(PlanKey.of(a) != PlanKey.of(a.filter(col("lang") === "en")))
  }
}
