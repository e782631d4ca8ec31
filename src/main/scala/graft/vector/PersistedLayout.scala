package graft.vector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared persist-or-load protocol of the vector indexes (IVF
  * cells, LSH buckets) — one implementation of the fingerprint
  * marker, the stamp-last crash semantics, and the concurrent-builder
  * guard, so the two indexes cannot drift (round-11 review: the first
  * cut duplicated ~30 lines of this in each).
  *
  * Freshness = the marker file's content equals the caller's `want`
  * string (full build config + corpus fingerprint). The build runs
  * under a best-effort create-exclusive lease BESIDE the index dir
  * ([[graft.claims.MaintenanceLease]]): two sessions racing to build
  * the same layout would otherwise interleave their overwrites and
  * the last marker stamp would certify a mixed directory — with the
  * lease, one session builds while the other reports [[Busy]] and
  * serves its query from an in-memory build this once. The marker is
  * stamped temp-then-rename AFTER the datasets commit, so a crashed
  * build is re-run, never half-loaded.
  */
private[graft] object PersistedLayout {

  sealed trait State
  /** Layout on disk matches `want` — load it. */
  case object Fresh extends State
  /** `build` ran under the lease and the marker is stamped — load. */
  case object Built extends State
  /** The caller's incremental hook brought the stale layout to `want`
    * (an index APPEND) and the marker is stamped — load.
    */
  case object Appended extends State
  /** Another session is building this layout right now — fall back
    * to the in-memory path for this call.
    */
  case object Busy extends State

  /** Corpus fingerprint over the non-null-vector rows: (row count,
    * bit_xor of id hashes). bit_xor, not a sum — order-independent
    * but overflow-free (a LongType sum of ~1e10 64-bit hashes wraps
    * silently with ANSI off and THROWS in an ANSI session); XOR
    * cancellation needs a duplicated id, and ids are the corpus
    * identity. Content mutation under an unchanged id set is
    * invisible by design — force a rebuild after such surgery.
    */
  def fingerprint(vectors: DataFrame, idCol: String,
      vecCol: String): (Long, Long) = {
    val fp = vectors.filter(col(vecCol).isNotNull)
      .agg(count(lit(1)), expr(s"bit_xor(xxhash64(`$idCol`))")).collect()(0)
    (fp.getLong(0), if (fp.isNullAt(1)) 0L else fp.getLong(1))
  }

  private[graft] def readMarker(spark: SparkSession, dir: String,
      metaFile: String): Option[String] = {
    val marker = new Path(dir, metaFile)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  private def markerMatches(spark: SparkSession, dir: String,
      metaFile: String, want: String): Boolean =
    readMarker(spark, dir, metaFile).contains(want)

  /** A 10-minute lease TTL: index builds are one corpus pass — far
    * under the interactive flow's 30-minute dial — and a crashed
    * builder should not park every other session on the in-memory
    * fallback for longer than that.
    */
  private val buildTtlMs = 10L * 60 * 1000

  def ensure(spark: SparkSession, dir: String, metaFile: String,
      want: String, rebuild: Boolean)(build: => Unit): State =
    ensureWith(spark, dir, metaFile, want, rebuild)(_ => false)(build)

  /** [[ensure]] with an incremental escape hatch: when a marker EXISTS
    * but mismatches `want`, `incremental(oldMarkerContent)` runs first
    * (under the lease, AFTER the old marker is invalidated) and may
    * bring the layout to the `want` state cheaper than a full build —
    * the index APPEND path. Returning false (config drift, deletion,
    * torn layout, growth past the refit threshold) falls through to
    * the full `build`. Neither hook stamps the marker — this method
    * does, once, after the datasets commit.
    *
    * Marker discipline (round-11 advice): the OLD marker is deleted
    * BEFORE either hook touches the datasets. `build` mode-overwrites
    * the index in place, so a crash mid-build under a surviving old
    * marker would leave a marker certifying torn data — fatal exactly
    * when `want` is unchanged (the documented `rebuild = true` use
    * after in-place vector mutation, which the content-blind
    * fingerprint cannot see) or when the corpus fingerprint reverts.
    * Invalidate-first + stamp-last means every crash window reads as
    * "stale → rebuild", mirroring the claims-side markers.
    */
  /** The proven-append precondition shared by every persisted store's
    * incremental hook (IVF cells, LSH buckets, dedup digests) — ONE
    * definition of the crash-safety-critical guard instead of three
    * drifting copies: the old marker's config lines must equal
    * `config` exactly, the corpus must have strictly GROWN (bounded by
    * `maxGrowFrac` of the old size — pass infinity for stores whose
    * quality never degrades with appends), and append-only-ness is
    * proven, not assumed: |corpus ∖ roster| (the caller's narrow id
    * anti-join against the store's id roster) must equal the
    * fingerprint count delta, which holds iff the stored ids are a
    * subset of the corpus. Only then does `write(appended)` run. Any
    * failure — config drift, deletion, replacement, over-threshold
    * growth, unreadable old layout — returns false and the caller
    * falls through to the full rebuild, which is always correct.
    */
  private[graft] def appendIfGrown(corpus: DataFrame, idCol: String,
      valCol: String, old: String, config: Seq[String], n: Long,
      maxGrowFrac: Double, roster: => DataFrame)(
      write: DataFrame => Unit): Boolean =
    try {
      val oldLines = old.split("\n").toSeq
      val oldN = oldLines.collectFirst {
        case s if s.startsWith("n=") => s.drop(2).toLong }.getOrElse(-1L)
      oldLines.filterNot(s =>
          s.startsWith("n=") || s.startsWith("idsum=")) == config &&
      oldN > 0 && n > oldN && (n - oldN) <= maxGrowFrac * oldN && {
        // Pinned so the roster anti-join — a full corpus-id-column
        // scan — runs ONCE per append: the count proof materializes
        // the (small) delta into the cache and `write`'s actions read
        // it back, instead of re-scanning the corpus per consuming
        // action (round-12 review item 7).
        val appended = corpus.filter(col(valCol).isNotNull)
          .join(roster, Seq(idCol), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try appended.count() == n - oldN && { write(appended); true }
        finally appended.unpersist(blocking = false)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        // The fall-through to a full rebuild is CORRECT but O(corpus);
        // a silently recurring append failure (a bug in a write hook,
        // persistent I/O trouble) would degrade every load to rebuild
        // cost with zero signal — log it so the degradation is
        // observable (round-12 advice). ComponentStore's deliberate
        // edge-limit escalation lands here too, by design: its message
        // says so.
        org.slf4j.LoggerFactory.getLogger("graft.vector.PersistedLayout")
          .warn(s"append hook failed for config=[${config.mkString(", ")}]" +
            s" n=$n — escalating to a full rebuild", e)
        false
    }

  /** Concurrency note (round-12 advice, documented trade): the Fresh
    * fast-path reads the marker OUTSIDE the lease, and callers then
    * read the datasets unleased — a concurrent session's append
    * (invalidate → append files → restamp) can therefore hand a
    * reader whose marker check passed just before the invalidation a
    * listing that includes mid-append files. Concurrent-session reads
    * during an append are BEST-EFFORT, exactly like the lease itself
    * (create-exclusive is detection, not mutual exclusion, on object
    * stores): the rows such a reader can over-see are the appended
    * delta — real corpus documents, just not yet certified by a
    * marker — never torn within a parquet file (parquet commits are
    * file-atomic). Sessions needing a certified snapshot re-call the
    * loader, whose marker comparison revalidates; serializing every
    * read against every append would put a lease acquisition on the
    * hot query path for a race that re-reading already heals.
    */
  def ensureWith(spark: SparkSession, dir: String, metaFile: String,
      want: String, rebuild: Boolean)(incremental: String => Boolean)(
      build: => Unit): State = {
    if (!rebuild && markerMatches(spark, dir, metaFile, want)) return Fresh
    graft.claims.MaintenanceLease.tryWithLease(spark, dir, buildTtlMs) {
      // Re-check INSIDE the lease: the builder we raced may have
      // finished between the first check and our acquisition.
      if (!rebuild && markerMatches(spark, dir, metaFile, want)) Fresh
      else {
        val root = new Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val old = readMarker(spark, dir, metaFile)
        val marker = new Path(root, metaFile)
        if (fs.exists(marker)) fs.delete(marker, false)
        val appended = !rebuild && old.exists(incremental)
        if (!appended) build
        graft.claims.DeleteJournal.writeMarkerAtomic(fs, root, metaFile, want)
        if (appended) Appended else Built
      }
    }.getOrElse(Busy)
  }
}
