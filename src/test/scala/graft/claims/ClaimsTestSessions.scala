package graft.claims

import org.apache.spark.sql.SparkSession

/** Session factory for the parameterized claims suites.
  *
  * Extensions bind only at session BUILD — `getOrCreate` silently
  * reuses an active session and drops them — so the extension variant
  * must stop whatever session a prior suite left active, build its
  * own, and tear down + clear afterwards so later suites lazily
  * rebuild theirs (the shared-JVM pattern from
  * RewriteGlobalRowNumberSpec; suites run sequentially under
  * `Test/fork := true`).
  */
object ClaimsTestSessions {

  def build(useExtensions: Boolean): SparkSession = {
    // BOTH variants start from a clean slate: the plain branch must not
    // inherit an extensions-bearing session a prior (possibly aborted)
    // suite left active, or the with/without comparison silently tests
    // extensions against extensions.
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
    (if (useExtensions) b.withExtensions(new graft.plans.GraftExtensions)
     else b).getOrCreate()
  }

  def teardown(spark: SparkSession): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }
}
