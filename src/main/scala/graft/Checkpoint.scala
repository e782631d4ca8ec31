package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Session-level materialization policy for the library's pinned
  * frames (the percentile histogram, the char/word-gram span frames,
  * connected-components iterations, the sorted-neighborhood ranked
  * frame).
  *
  * Every kernel that materializes an intermediate routes through
  * [[pin]], which picks between two storage contracts:
  *
  *  - '''default''' (`graft.checkpoint.reliable` unset/false):
  *    `localCheckpoint` — lineage truncated, blocks held UNREPLICATED
  *    on the executors that computed them. Fastest, and the right
  *    trade on a single machine or a stable cluster, but an executor
  *    lost AFTER the pin (spot reclaim, OOM kill) makes the frame
  *    unrecoverable: there is no lineage to recompute from, so the
  *    job dies rather than retries.
  *  - '''reliable''' (`graft.checkpoint.reliable=true`): `checkpoint`
  *    through `SparkContext.setCheckpointDir` — blocks written to the
  *    (HDFS/object-store) checkpoint directory, so ANY executor can
  *    re-read them after a loss and the job survives churn. This is
  *    the HA path a 1000-executor run on preemptible capacity should
  *    set; it costs one write + read of the pinned frame through the
  *    cluster filesystem.
  *
  * Kernels that can run WITHOUT materializing at all (the span
  * reports' `materialize = false` recompute path — spec-proven equal
  * output) are the third option when neither storage contract fits.
  *
  * The policy is read per-call from the session conf, so one session
  * can flip it between jobs without rebuilding anything.
  */
object Checkpoint {

  /** Session conf key selecting the reliable (replicated, executor-
    * loss-survivable) checkpoint path. Requires
    * `SparkContext.setCheckpointDir` to have been called.
    */
  val ReliableConf = "graft.checkpoint.reliable"

  def reliable(spark: SparkSession): Boolean =
    spark.conf.getOption(ReliableConf).exists(_.trim.equalsIgnoreCase("true"))

  private val warnedFileCleanup = new java.util.concurrent.atomic.AtomicBoolean

  /** Reliable pins are kernel-INTERNAL (one per percentile histogram,
    * per CC round, …), so callers cannot delete their files; without
    * the ContextCleaner option below, a long-lived session leaks one
    * checkpoint-dir entry per pin until the filesystem quota ends the
    * job. Warn loudly ONCE per JVM — the conf is read at context
    * startup, so the library cannot flip it after the fact.
    */
  private def warnIfFilesLeak(spark: SparkSession): Unit =
    if (!spark.sparkContext.getConf.getBoolean(
        "spark.cleaner.referenceTracking.cleanCheckpoints", false) &&
      warnedFileCleanup.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger("graft.Checkpoint").warn(
        s"$ReliableConf=true without " +
          "spark.cleaner.referenceTracking.cleanCheckpoints=true: " +
          "kernel-internal checkpoint files are never deleted while the " +
          "application runs — set the cleaner conf at session startup " +
          "(files then delete when their pinned frames are GC'd) or " +
          "point setCheckpointDir at a path with a TTL/cleanup policy")

  /** Materialize `df` under the session's checkpoint policy and return
    * the pinned frame (lineage truncated either way; see the object
    * doc for the storage contract). `eager = false` defers the
    * materializing job to the frame's first action — construction
    * stays side-effect-free for callers that only build or inspect
    * the plan.
    */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (reliable(spark)) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true requires SparkContext.setCheckpointDir " +
          "(a cluster-visible path) before the first pinned kernel runs; " +
          "reliable checkpoints are written there so executor loss is " +
          "recoverable")
      warnIfFilesLeak(spark)
      if (eager) {
        // Reliable checkpointing launches a SECOND job to write the
        // files, which would recompute the whole subtree from lineage
        // (the classic double-compute; Spark's own scaladoc advises
        // persisting first). Caching through the pin makes the write
        // job read blocks instead, and the cache is dropped as soon as
        // the checkpoint files exist — the pin costs one compute +
        // one cached re-read + one FS write, not two computes.
        val cached =
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try cached.checkpoint(eager = true)
        finally cached.unpersist(blocking = false)
      } else
        // Lazy: materialization happens at the caller's first action,
        // so there is no safe point to drop a helper cache — accept
        // the recompute on the write job (pins here are histogram- or
        // gram-frame-sized, far below the fact table).
        df.checkpoint(eager = false)
    } else df.localCheckpoint(eager)
  }

  /** CALL-SCOPED pin: always `localCheckpoint`, regardless of the
    * session's reliable policy. For frames that live only inside one
    * method call (a merge batch probed by a handful of jobs and
    * discarded), a reliable checkpoint buys nothing — the caller's
    * natural retry re-runs the whole call — while writing a permanent
    * file-set per invocation through the cluster FS (release cannot
    * delete reliable FILES, so a per-trigger streaming caller would
    * leak one batch copy per trigger into the checkpoint dir).
    * Release with [[release]] in a `finally`.
    */
  def pinTransient(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Whether `df` is already a pinned (lineage-truncated, MATERIALIZED
    * checkpoint-backed) frame. Lets a callee that would defensively
    * [[pinTransient]] its input skip the SECOND block copy when the
    * caller pinned already — and, symmetrically, skip releasing a
    * frame it does not own.
    *
    * A bare `LogicalRDD` is NOT enough: `spark.createDataFrame(rdd,
    * schema)` and streaming foreachBatch frames are RDD-backed with
    * nothing persisted — treating those as pinned would let their
    * (possibly nondeterministic) lineage recompute per consuming job,
    * the exact divergence a pin prevents. Hence the
    * `isCheckpointed` requirement (true only once a reliable OR local
    * checkpoint has materialized); anything unproven pins again,
    * which is merely a redundant copy, never a correctness hole.
    */
  def isPinned(df: DataFrame): Boolean = df.queryExecution.analyzed match {
    case l: LogicalRDD =>
      try l.rdd.isCheckpointed catch { case _: Exception => false }
    case _ => false
  }

  /** [[pin]] unless the frame is already pinned — for kernels whose
    * callers may hand them an already-materialized shared frame (the
    * session-cached co-occurrence edge set feeding the whole graph
    * family): a second pin would only copy the blocks again.
    */
  def ensurePinned(df: DataFrame): DataFrame =
    if (isPinned(df)) df else pin(df)

  /** Drop the storage behind a frame returned by [[pin]] (best-effort;
    * reliable checkpoint FILES are left for the cleaner/dir owner —
    * only block-manager storage is released). After release the frame
    * must not be read again: its lineage was truncated at pin time,
    * so there is nothing to recompute from. Intended for cache
    * eviction (see [[SessionCache]]), where the frame is being
    * discarded anyway.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l
    }.foreach { l =>
      try l.rdd.unpersist(blocking = false)
      catch { case _: Exception => () }
    }

  /** Reliable-checkpoint directories backing a pinned frame (empty for
    * local pins — those have blocks, not files). Owned here so callers
    * ([[SessionCache]]'s eviction accounting) never pattern-match
    * Spark plan internals themselves.
    */
  def checkpointDirsOf(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.flatMap(_.getCheckpointFile)
}
