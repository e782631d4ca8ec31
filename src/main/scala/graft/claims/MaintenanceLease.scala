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
  * Mechanics: a create-EXCLUSIVE marker (`_graft_lease`) in the mart
  * dir — `FileSystem.create(path, overwrite = false)` throws when the
  * file exists, which is atomic on HDFS and posix filesystems (object
  * stores without atomic create-exclusive keep the documented
  * single-writer contract; the lease is then best-effort detection,
  * not mutual exclusion). The marker carries the holder's epoch-ms
  * and owner id; a holder that died without releasing is taken over
  * once the marker is older than `ttlMs` (delete + re-create-
  * exclusive, so two racing takeovers still serialize on the create).
  *
  * This is an AVAILABILITY trade only: a crashed flow blocks new
  * uploads for at most the TTL, and every crash window inside the
  * flow remains journaled and replayable regardless of the lease.
  */
object MaintenanceLease {

  private[claims] val leaseFile = "_graft_lease"

  /** Default takeover TTL — long enough that no healthy upload flow
    * (probe + upsert + count replacement + refresh) outlives it.
    */
  val defaultTtlMs: Long = 30L * 60 * 1000

  /** Acquire, run `body`, release. Throws IllegalStateException —
    * BEFORE any state is touched — when another writer holds a live
    * lease.
    */
  def withLease[A](spark: org.apache.spark.sql.SparkSession, dir: String,
      ttlMs: Long = defaultTtlMs)(body: => A): A = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val owner = java.util.UUID.randomUUID().toString
    acquire(fs, root, owner, ttlMs)
    try body
    finally release(fs, root, owner)
  }

  private[claims] def acquire(fs: FileSystem, root: Path, owner: String,
      ttlMs: Long): Unit = {
    if (!fs.exists(root)) fs.mkdirs(root)
    val marker = new Path(root, leaseFile)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(marker, false)
        try out.write(s"epoch=${System.currentTimeMillis()}\nowner=$owner\n"
          .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return
    // Held: live → fail loudly; stale (holder died > TTL ago, or the
    // marker is torn/unreadable and old enough by mtime) → take over.
    val ageOk =
      readEpoch(fs, marker).orElse(
        try Some(fs.getFileStatus(marker).getModificationTime)
        catch { case _: java.io.IOException => None })
        .forall(e => System.currentTimeMillis() - e > ttlMs)
    if (!ageOk || { fs.delete(marker, false); !tryCreate() })
      throw new IllegalStateException(
        s"another maintenance writer holds the lease at $marker; " +
          "concurrent hub/mart maintenance is single-writer " +
          s"(stale takeover after ${ttlMs} ms)")
  }

  private[claims] def release(fs: FileSystem, root: Path,
      owner: String): Unit = {
    val marker = new Path(root, leaseFile)
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

  private def readEpoch(fs: FileSystem, marker: Path): Option[Long] =
    readLines(fs, marker)
      .collectFirst { case l if l.startsWith("epoch=") =>
        l.stripPrefix("epoch=") }
      .flatMap(_.toLongOption)

  private def readOwner(fs: FileSystem, marker: Path): Option[String] =
    readLines(fs, marker)
      .collectFirst { case l if l.startsWith("owner=") =>
        l.stripPrefix("owner=") }
}
