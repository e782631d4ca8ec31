package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence audits for the distributed global-rank and incremental
  * dedup entries: each must reproduce an independently computed result
  * exactly (a different Spark plan for the rank; driver-side Scala set
  * logic for the dedup).
  */
class RankDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q_global_rank equals the single-partition row_number plan") {
    val fast = SparkEntry.queries("q_global_rank")(spark, sf)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_chars").desc, col("doc_id")))
        .cast("long"))
    assert(fast.exceptAll(naive).count() == 0 &&
      naive.exceptAll(fast).count() == 0)
    // The wide window must be keyed (parallel), never global.
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(n_chars"),
      s"global-rank window lost its key partitioning:\n${plan.take(600)}")
  }

  test("twoLevelRank keeps and ranks null-bucket rows (nulls first asc)") {
    import spark.implicits._
    val df = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("b"))).toDF("id", "bkt")
    val r = Ranking.twoLevelRank(df, partCols = Nil, bucketCol = "bkt",
      bucketAsc = true, tieCols = Seq("id"), out = "rk")
    val m = r.collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rk")).toMap
    assert(m == Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("q_dedup_snm equals the naive global-window neighborhood join") {
    val got = SparkEntry.queries("q_dedup_snm")(spark, sf)
    val hdrs = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(lower(col("text")), 1, 32).as("hdr"))
    val r = hdrs.withColumn("rn",
      row_number().over(Window.orderBy(col("hdr"), col("doc_id"))))
    val naive = r.as("a").join(r.as("b"),
        col("b.rn") > col("a.rn") && col("b.rn") <= col("a.rn") + 10)
      .filter(levenshtein(col("a.hdr"), col("b.hdr")) <= 8)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.hdr"), col("b.hdr")).as("dist"))
    assert(got.exceptAll(naive).count() == 0 &&
      naive.exceptAll(got).count() == 0)
  }

  test("q_dedup_incremental equals driver-side set logic") {
    val got = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp")))
      .toSet
    val fps = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.text.TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp")))
    val corpus = fps.collect { case (id, fp) if id % 10 < 8 => fp }.toSet
    val expect = fps.filter { case (id, fp) => id % 10 >= 8 && !corpus(fp) }
      .groupBy(_._2).map { case (fp, xs) => (xs.map(_._1).min, fp) }.toSet
    assert(got == expect && got.nonEmpty)
  }
}
