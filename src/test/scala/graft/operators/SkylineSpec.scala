package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tie semantics of the skyline sweep (q_skyline kernel): dominance
  * requires ≥ in both dimensions and STRICTLY > in at least one, so
  * exact duplicates co-survive while equal-spend lower-order and
  * equal-order lower-spend points are dominated. The driver entry's
  * oracle covers the bulk geometry; the synthetic corpus need not
  * produce ties, which is exactly where a sweep implementation can
  * silently differ from the NOT EXISTS definition.
  */
class SkylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sweep(rows: Seq[(Long, String, Long)]): Set[Long] = {
    import spark.implicits._
    val t = rows.toDF("o_custkey", "s", "n_orders")
      .select(col("o_custkey"), col("s").cast("decimal(18,2)").as("spend"),
        col("n_orders"))
    RelationalQueries.skylineSweep(t)
      .collect().map(_.getLong(0)).toSet
  }

  test("exact duplicates co-survive; dominated points drop") {
    // (100, 5) twice: neither strictly exceeds the other → both stay.
    // (100, 3) is equal-spend dominated; (90, 5) equal-order dominated;
    // (80, 9) survives on the order axis; (70, 1) fully dominated.
    val got = sweep(Seq(
      (1L, "100.00", 5L), (2L, "100.00", 5L), (3L, "100.00", 3L),
      (4L, "90.00", 5L), (5L, "80.00", 9L), (6L, "70.00", 1L)))
    assert(got === Set(1L, 2L, 5L))
  }

  test("a staircase frontier survives whole; interior points drop") {
    // Strictly decreasing orders as spend rises = all on the frontier.
    val stairs = Seq((1L, "10.00", 50L), (2L, "20.00", 40L),
      (3L, "30.00", 30L), (4L, "40.00", 20L), (5L, "50.00", 10L))
    val interior = Seq((6L, "15.00", 35L), (7L, "35.00", 15L))
    assert(sweep(stairs ++ interior) === Set(1L, 2L, 3L, 4L, 5L))
    // A single point dominating everything collapses the skyline to it.
    assert(sweep(stairs :+ (9L, "60.00", 60L)) === Set(9L))
  }

  test("cross-bucket running max: dominator far above the victim's bucket") {
    // Buckets are floor(spend/100000): put the dominator several empty
    // buckets above so the exclusive bucket prefix-max (not the
    // in-bucket window) must carry the domination.
    val got = sweep(Seq(
      (1L, "900000.00", 5L), (2L, "100.00", 5L), (3L, "100.00", 7L)))
    assert(got === Set(1L, 3L))
  }
}
