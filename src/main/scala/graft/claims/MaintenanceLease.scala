package graft.claims

import org.apache.hadoop.fs.{FileSystem, Path}

/** Loud single-writer lease for hub+mart maintenance (round-10 review
  * item 4). The non-table-format layouts (hub partitions, mart
  * buckets, count store) are maintained under a documented
  * single-writer expectation; before this lease a second concurrent
  * [[UploadFlow]] corrupted state silently except for the one tmp-
  * rename race that happened to fail loudly. The lease turns the
  * undefined case into a deterministic, pre-upsert failure.
  *
  * The marker lives BESIDE the mart dir (`<martDir>_lease`), never
  * inside it: the full-rebuild path static-overwrites the mart dir —
  * which deletes everything in it — and a lease stored there would be
  * destroyed MID-FLOW by its own holder, reopening the race it exists
  * to close (round-11 review).
  *
  * Mechanics: create-EXCLUSIVE (`FileSystem.create(path, overwrite =
  * false)` throws when the file exists), atomic on HDFS and posix
  * filesystems (object stores without atomic create-exclusive keep
  * the documented single-writer contract; the lease is then
  * best-effort detection, not mutual exclusion). The marker carries
  * the holder's epoch-ms and owner id; a holder that died without
  * releasing is taken over once the marker is older than `ttlMs`.
  * Takeover re-reads the marker IMMEDIATELY before deleting and
  * aborts if its content changed since the staleness check — two
  * racing takeovers then serialize on the create except for the
  * residual read→delete window (milliseconds against a TTL of
  * minutes; closing it entirely needs a compare-and-swap no plain
  * FileSystem offers — the table-format adjudication in COVERAGE).
  *
  * This is an AVAILABILITY trade only: a crashed flow blocks new
  * uploads for at most the TTL, and every crash window inside the
  * flow remains journaled and replayable regardless of the lease.
  */
object MaintenanceLease {

  /** Lease marker path for a protected directory: a SIBLING file. */
  private[graft] def leasePathFor(dir: String): Path =
    new Path(dir.stripSuffix("/") + "_lease")

  /** Default takeover TTL — long enough that no healthy upload flow
    * (probe + upsert + count replacement + refresh) outlives it.
    */
  val defaultTtlMs: Long = 30L * 60 * 1000

  /** Leases held by the CURRENT THREAD (qualified marker URIs), making
    * [[withLease]] reentrant like a ReentrantLock: round-12 wraps the
    * individual maintenance verbs (mart refresh, counts rebuild,
    * bucketed-hub writes) in their own leases so DIRECT callers
    * serialize against a running [[UploadFlow]] — and the flow, which
    * already holds the lease, calls those same verbs. Per-THREAD, not
    * per-process: two threads of one JVM racing the same mart must
    * still exclude each other (the corruption is the same as two
    * processes'). Driver-side maintenance code runs on one thread;
    * Spark's executor threads never touch this object.
    */
  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private def qualified(fs: FileSystem, marker: Path): String =
    fs.makeQualified(marker).toUri.toString

  /** Acquire, run `body`, release. Throws IllegalStateException —
    * BEFORE any state is touched — when another writer holds a live
    * lease. Reentrant: a thread already holding this lease runs `body`
    * directly (the outermost holder owns the marker lifecycle).
    */
  def withLease[A](spark: org.apache.spark.sql.SparkSession, dir: String,
      ttlMs: Long = defaultTtlMs)(body: => A): A = {
    val marker = leasePathFor(dir)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = qualified(fs, marker)
    if (held.get.contains(key)) return body
    val owner = java.util.UUID.randomUUID().toString
    acquire(fs, marker, owner, ttlMs)
    held.get += key
    try body
    finally { held.get -= key; release(fs, marker, owner) }
  }

  /** Like [[withLease]] but returns None instead of throwing when
    * another writer holds a live lease — for callers with a correct
    * degraded path (the persisted vector indexes fall back to an
    * in-memory build while a concurrent session writes the layout).
    */
  def tryWithLease[A](spark: org.apache.spark.sql.SparkSession,
      dir: String, ttlMs: Long = defaultTtlMs)(body: => A): Option[A] = {
    val marker = leasePathFor(dir)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = qualified(fs, marker)
    if (held.get.contains(key)) return Some(body)
    val owner = java.util.UUID.randomUUID().toString
    try acquire(fs, marker, owner, ttlMs)
    catch { case _: IllegalStateException => return None }
    held.get += key
    try Some(body)
    finally { held.get -= key; release(fs, marker, owner) }
  }

  private[graft] def acquire(fs: FileSystem, marker: Path, owner: String,
      ttlMs: Long): Unit = {
    val parent = marker.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(marker, false)
        try out.write(s"epoch=${System.currentTimeMillis()}\nowner=$owner\n"
          .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    def fail(): Nothing = throw new IllegalStateException(
      s"another maintenance writer holds the lease at $marker; " +
        "concurrent hub/mart maintenance is single-writer " +
        s"(stale takeover after ${ttlMs} ms)")
    if (tryCreate()) return
    // Held. Live → fail loudly. Stale (holder died > TTL ago, or the
    // marker is torn/unreadable and old enough by mtime) → take over,
    // but ONLY if the marker still holds the exact content the
    // staleness decision was made on — a racing takeover's fresh
    // lease must never be deleted by a decision made against the
    // stale one.
    val first = readLines(fs, marker)
    val epoch = parseEpoch(first).orElse(
      try Some(fs.getFileStatus(marker).getModificationTime)
      catch { case _: java.io.IOException => None })
    val stale = epoch.forall(e => System.currentTimeMillis() - e > ttlMs)
    if (!stale) fail()
    if (readLines(fs, marker) != first) fail()
    fs.delete(marker, false)
    if (!tryCreate()) fail()
  }

  private[graft] def release(fs: FileSystem, marker: Path,
      owner: String): Unit = {
    // Delete only OUR lease: a stale takeover may have replaced it,
    // and deleting the new holder's marker would un-serialize them.
    if (fs.exists(marker) && readOwner(fs, marker).contains(owner))
      fs.delete(marker, false)
  }

  private def readLines(fs: FileSystem, marker: Path): Seq[String] =
    try {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    } catch { case _: java.io.IOException => Nil }

  private def parseEpoch(lines: Seq[String]): Option[Long] =
    lines.collectFirst { case l if l.startsWith("epoch=") =>
      l.stripPrefix("epoch=") }.flatMap(_.toLongOption)

  private def readOwner(fs: FileSystem, marker: Path): Option[String] =
    readLines(fs, marker)
      .collectFirst { case l if l.startsWith("owner=") =>
        l.stripPrefix("owner=") }
}
