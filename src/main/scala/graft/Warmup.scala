package graft

import org.apache.spark.sql.SparkSession

/** Shared JVM warm-up for the entry-point mains (Bench / Verify /
  * RunQueries): runs the scan path and the text/dedup kernels once on a
  * bounded slice so the first TIMED query doesn't absorb one-time
  * costs — parquet reader init, whole-stage codegen, and JIT of the
  * higher-order token/shingle/UDF paths (measured: the first
  * `tokens()` stage costs ~1.8 s cold vs ~0.25 s warm). Same
  * convention as the round-2 scan warm-up that removed the 1.2 s
  * first-query floor.
  */
object Warmup {
  def run(spark: SparkSession, sfDir: String): Unit =
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/orders.parquet").count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .limit(64).cache()
      docs.count()
      text.DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
        cacheKey = Some("__warm_minhash")).count()
      text.DedupJobs.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("lang"), 2, 0.8, cacheKey = Some("__warm_ngram")).count()
      text.DedupJobs.simhashNearDups(docs, "doc_id", "text",
        maxHamming = 3).count()
      docs.unpersist()
    } catch {
      // The only expected failure is a missing/foreign sfDir
      // (PATH_NOT_FOUND); anything else should surface.
      case _: org.apache.spark.sql.AnalysisException => ()
    }
}
