package graft.claims

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference upload page's save sequence as one reusable flow
  * (ref: pages/1_데이터_업로드.py:107-117 — preprocess → hub save →
  * series regeneration), shared by the interactive facade
  * (`graft.api.ClaimAnalysisEngine.uploadBatch`) and the streaming
  * ingester (`graft.streaming.StreamingIngest`) so the two ingest
  * paths cannot drift:
  *
  *  1. probe the batch claims' CURRENT mart keys against the
  *     pre-upsert hub ([[SeriesMart.priorParentKeys]] — a key move's
  *     old location is unknowable after the merge);
  *  2. journal those keys durably into the mart dir
  *     ([[SeriesMart.journalTouchedKeys]]) so a crash between the hub
  *     commit and the completed refresh is recoverable by replay;
  *  3. upsert the hub (partition-scoped, crash-journaled);
  *  4. refresh the bucketed mart incrementally from the merged truth.
  *
  * Replaying the same batch after a crash at ANY point is idempotent:
  * the upsert's keyed merge converges, and the refresh regenerates
  * from the merged hub with the journaled keys unioned in.
  */
object UploadFlow {

  /** Returns true when the mart refresh took the incremental path
    * (false = a guard forced the full rebuild; see
    * [[SeriesMart.refreshIncremental]]).
    */
  def run(spark: SparkSession, prepared: DataFrame, hubPath: String,
      martDir: String, asOf: String, buckets: Int = 64): Boolean = {
    // The batch lineage (CSV read + canonicalize + preprocess shuffle)
    // is consumed by three stages — pin it once. Transient: the frame
    // dies with this call; a retry replays the whole flow.
    val batch = graft.Checkpoint.pinTransient(prepared)
    try {
      val priors =
        if (HubStore.exists(spark, hubPath))
          SeriesMart.priorParentKeys(HubStore.read(spark, hubPath), batch)
        else Set.empty[String]
      if (priors.nonEmpty)
        SeriesMart.journalTouchedKeys(spark, martDir, priors)
      HubStore.upsert(spark, batch, hubPath)
      SeriesMart.refreshIncremental(HubStore.read(spark, hubPath), batch,
        asOf, martDir, buckets, priors)
    } finally graft.Checkpoint.release(batch)
  }
}
