package graft.claims

import org.apache.hadoop.fs.{FileSystem, Path}

/** Append-only generation journal shared by the mart's touched-keys
  * journal ([[SeriesMart.journalTouchedKeys]]) and the count store's
  * pending-partitions journal ([[SeriesCounts]]). Each append writes
  * its lines to a FRESH `<prefix>.<uuid>` marker, because replacing
  * one journal file is not crash-atomic on non-HDFS stores
  * (delete-then-rename — see [[DeleteJournal.writeMarkerAtomic]]) and
  * a crashed writer's retry must never be able to destroy what the
  * crashed attempt recorded. Readers union every generation; a
  * consumer deletes exactly the generations it read, so a generation
  * written by a racing writer after the read survives for that
  * writer's own replay.
  *
  * Line content is caller-defined (the mart base64-encodes raw key
  * text; the count store writes `y,m` integer pairs) — this object
  * only owns the generation lifecycle.
  */
private[claims] object GenerationJournal {

  /** Write one fresh generation holding `lines`. No-op for empty
    * lines. Full-UUID suffix: the marker write delete-then-renames an
    * existing destination, so a name collision with a live generation
    * would silently destroy it — 122 random bits rules that out.
    */
  def append(fs: FileSystem, root: Path, prefix: String,
      lines: Seq[String]): Unit = {
    if (lines.isEmpty) return
    if (!fs.exists(root)) fs.mkdirs(root)
    DeleteJournal.writeMarkerAtomic(fs, root,
      prefix + "." + java.util.UUID.randomUUID().toString,
      lines.mkString("\n"))
  }

  /** Every journaled generation: (union of non-empty trimmed lines,
    * the marker paths read). Torn `.tmp` files are skipped — they were
    * never renamed into place, so their content was never acted on.
    */
  def readAll(fs: FileSystem, root: Path,
      prefix: String): (Seq[String], Seq[Path]) = {
    if (!fs.exists(root)) return (Nil, Nil)
    val markers = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith(prefix) &&
        !p.getName.endsWith(".tmp")).toSeq
    val lines = markers.flatMap { p =>
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    }
    (lines, markers)
  }

  /** Delete the generations `read` plus any orphaned `.tmp` files a
    * crashed write left (unique names are never re-targeted, so
    * nothing else ever cleans them). Sweeping a tmp a RACING writer is
    * renaming this instant makes that writer's rename fail LOUDLY —
    * the right failure for the documented single-writer expectation.
    */
  def clear(fs: FileSystem, root: Path, prefix: String,
      read: Seq[Path]): Unit = {
    read.foreach(fs.delete(_, false))
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(p => p.getName.startsWith(prefix) &&
          p.getName.endsWith(".tmp"))
        .foreach(fs.delete(_, false))
  }
}
