package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof that a user session wired up via
  * `spark.sql.extensions` / `.withExtensions` gets the global-ranking
  * rewrite on AD-HOC SQL over real parquet — and that the rewrite is
  * value-invisible: the same query in a plain session returns the
  * identical row set (order-insensitive compare; the rewrite
  * documents that OUTPUT ORDER changes).
  */
class GraftExtensionsE2ESpec extends AnyFunSuite {

  private val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

  /** Runs `sql` against the orders table in a fresh session; returns
    * (plan contains the rewrite join, sorted row strings).
    */
  private def run(useExtensions: Boolean, sql: String): (Boolean, Seq[String]) = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
    val spark =
      (if (useExtensions) b.withExtensions(new GraftExtensions) else b)
        .getOrCreate()
    try {
      spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders")
      val q = spark.sql(sql)
      (q.queryExecution.optimizedPlan.toString.contains("Join"),
        q.collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("ad-hoc global row_number SQL rewrites and matches the plain session") {
    val sql = """SELECT o_orderkey, o_totalprice,
      row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders"""
    val (rewrote, got) = run(useExtensions = true, sql)
    val (plainJoined, exp) = run(useExtensions = false, sql)
    assert(rewrote, "extension session did not rewrite the global window")
    assert(!plainJoined, "plain session unexpectedly planned a join")
    assert(got.size == exp.size && got == exp,
      s"row sets differ: ${got.size} vs ${exp.size}")
  }

  test("ad-hoc global rank SQL (with real ties) rewrites and matches") {
    // o_orderpriority has 5 values over 15k rows — dense ties exercise
    // the rank offset arithmetic on real data.
    val sql = """SELECT o_orderkey,
      rank() OVER (ORDER BY o_orderpriority, o_orderkey % 100) AS rk
      FROM orders"""
    val (rewrote, got) = run(useExtensions = true, sql)
    val (_, exp) = run(useExtensions = false, sql)
    assert(rewrote, "rank() did not rewrite")
    assert(got == exp)
  }

  test("ad-hoc global ntile SQL rewrites and matches on real data") {
    // A total order (o_orderkey unique) makes ntile deterministic, so
    // the bucket assignment must match the plain session row for row;
    // 7 buckets over the table is the non-divisible remainder case.
    val sql = """SELECT o_orderkey,
      ntile(7) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS nt
      FROM orders"""
    val (rewrote, got) = run(useExtensions = true, sql)
    val (plainJoined, exp) = run(useExtensions = false, sql)
    assert(rewrote, "ntile() did not rewrite")
    assert(!plainJoined, "plain session unexpectedly planned a join")
    assert(got == exp)
  }
}
