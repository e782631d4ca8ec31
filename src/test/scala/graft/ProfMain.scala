package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (test scope, not shipped). */
object ProfMain {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val jobTimes = new scala.collection.concurrent.TrieMap[Int, Long]()
    @volatile var traceJobs = false
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(js.jobId) = System.nanoTime()
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (traceJobs) starts.get(je.jobId).foreach { t0 =>
          println(f"PROFJOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.3f s")
        }
    })
    Warmup.run(spark, d)

    val asOf = LocalDate.of(2030, 1, 1)

    // ---- risk scan stages on orders ----
    val orders = Tables.orders(spark, d)
    time("orders.count")(orders.count())
    val ymOf = date_format(col("o_orderdate"), "yyyy-MM")
    time("bounds")(orders.agg(min(ymOf), max(ymOf)).head())
    val counts = graft.claims.RiskScanJob.monthlyCounts(
      orders, Seq("o_orderpriority", "o_orderstatus"), "o_orderdate")
    time("counts")(counts.count())
    val grouped = counts.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(map_from_entries(collect_list(struct(col("ym"), col("n")))).as("__m"))
    time("grouped")(grouped.count())
    time("scan full")(graft.claims.RiskScanJob.scan(orders,
      Seq("o_orderpriority", "o_orderstatus"), "o_orderdate", None, asOf).count())
    time("scan full 2nd")(graft.claims.RiskScanJob.scan(orders,
      Seq("o_orderpriority", "o_orderstatus"), "o_orderdate", None, asOf).count())

    // ---- events ----
    val events = Tables.events(spark, d)
    time("events scan full")(graft.claims.RiskScanJob.scan(events,
      Seq("user_id", "event_type"), "ts", None, asOf).count())
    time("events scan 2nd")(graft.claims.RiskScanJob.scan(events,
      Seq("user_id", "event_type"), "ts", None, asOf).count())

    // ---- minhash stages ----
    {
      import graft.text.TextFunctions._
      val docs = Tables.documents(spark, d)
      time("docs count")(docs.count())
      val toks = docs
        .select(col("doc_id"), tokens(col("text")).as("__toks"))
        .filter(size(col("__toks")) > 0)
        .persist()
      time("tokenize")(toks.count())
      time("tok stats")(println(toks.agg(sum(size(col("__toks"))), avg(size(col("__toks")))).head()))
      val sh = toks.select(col("doc_id"), shinglesOf(col("__toks"), 3).as("sh"))
      time("shingles all")(sh.agg(sum(size(col("sh")))).head())
      toks.unpersist()
      traceJobs = true
      val pairs = time("minhash build (call)")(
        graft.text.DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
          cacheKey = Some("prof1")))
      time("minhash cached count")(pairs.count())
      val grp = graft.text.DedupJobs.minhashDupGroups(docs, "doc_id", "text",
        cacheKey = Some("prof1"))
      time("minhash groups (cached pairs)")(grp.count())
      val ng = time("ngram build (call)")(
        graft.text.DedupJobs.ngramJaccardPairs(docs, "doc_id", "text",
          Seq("lang"), 2, 0.8, cacheKey = Some("prof2")))
      time("ngram cached count")(ng.count())
      traceJobs = false
    }

    // ---- simhash stages ----
    val docs = Tables.documents(spark, d)
    val sigs = time("sigs build")(docs
      .select(col("doc_id"), graft.text.TextFunctions.simhash64(col("text")).as("simhash"))
      .persist())
    time("sigs count")(sigs.count())
    val pairs = graft.text.DedupJobs.simhashNearDupsOf(sigs,
      maxHamming = 3, maxBucket = 200, blocks = 4, comboSize = 1)
    time("simhash pairs")(pairs.count())
    time("simhash pairs 2nd")(pairs.count())
    sigs.unpersist()

    spark.stop()
  }
}
