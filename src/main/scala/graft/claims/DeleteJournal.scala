package graft.claims

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe journal for directory deletes that follow a committed
  * partitioned overwrite (HubStore's vacated month partitions,
  * SeriesMart's vacated key buckets). The dirs a journal lists are
  * already superseded by the committed write, so deleting them is safe
  * at any later time — the journal only exists so a crash between the
  * commit and the deletes is healed by the next writer instead of
  * leaving stale files forever.
  *
  * Torn-write safety: the marker is written to a `.tmp` name and
  * RENAMED into place (atomic on HDFS and posix filesystems), because a
  * truncated last line can name a LIVE directory ("접수월=11" cut to
  * "접수월=1") that healing would then recursively delete. A crash
  * before the rename leaves only the tmp file, which [[heal]] discards
  * unread — the interrupted writer's retry rediscovers its vacated set
  * from its own probe.
  */
private[claims] object DeleteJournal {

  /** Write `body` to `markerName` under `root` via temp-then-rename.
    * The rename OVERWRITES an existing marker in one step
    * (`FileContext` + `Options.Rename.OVERWRITE`, atomic on HDFS and
    * posix filesystems) — a delete-then-rename pair would open a
    * window where a crash leaves NO marker at all, losing the previous
    * marker's contents; for a journal whose old content is still
    * load-bearing (the touched-keys journal a retry rewrites) that
    * silently voids the guarantee. `FileContext.rename` throws on
    * failure, so a refused rename is loud.
    */
  def writeMarkerAtomic(fs: FileSystem, root: Path, markerName: String,
      body: String): Unit = {
    val marker = new Path(root, markerName)
    val tmp = new Path(root, markerName + ".tmp")
    // The tmp is created through the SAME FileContext that renames it:
    // mixing FileSystem.create (checksummed on local FS — writes a
    // .crc sidecar) with a raw FileContext rename would strand stale
    // checksum files that poison later reads of the marker path.
    val fc = org.apache.hadoop.fs.FileContext
      .getFileContext(fs.getUri, fs.getConf)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    fc.rename(tmp, marker, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Journal `rels` (paths relative to `root`) atomically, delete them,
    * then clear the journal. No-op for an empty list.
    */
  def journalThenDelete(fs: FileSystem, root: Path, markerName: String,
      rels: Seq[String]): Unit = {
    if (rels.isEmpty) return
    writeMarkerAtomic(fs, root, markerName, rels.mkString("\n"))
    rels.foreach(deleteDir(fs, root, _))
    fs.delete(new Path(root, markerName), false)
  }

  /** Finish a crashed writer's journaled deletes (no-op when none). */
  def heal(fs: FileSystem, root: Path, markerName: String): Unit = {
    val tmp = new Path(root, markerName + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false)
    val marker = new Path(root, markerName)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val rels =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      rels.foreach(deleteDir(fs, root, _))
      fs.delete(marker, false)
    }
  }

  private def deleteDir(fs: FileSystem, root: Path, rel: String): Unit = {
    val dir = new Path(root, rel)
    if (fs.exists(dir)) fs.delete(dir, true)
    // Prune an emptied intermediate level too (hive `접수년=Y/접수월=M`
    // layouts leave an empty year dir when its last month goes) — a
    // flat layout's parent IS the root, so the check skips it.
    val parent = dir.getParent
    if (parent != root && fs.exists(parent) &&
        fs.listStatus(parent).isEmpty)
      fs.delete(parent, false)
  }
}
