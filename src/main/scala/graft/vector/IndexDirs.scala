package graft.vector

/** Canonical on-disk homes for the persisted vector indexes: derived
  * from the dataset key (usually the corpus dir) + the full index
  * config, so EVERY consumer with the same (corpus, id, vec, config)
  * converges on one shared layout — the IVF ANN entry, the recall
  * audit, and SemDeDup all reuse a single `ivf-…-k16` index. Lives
  * under the JVM tmpdir, never beside the (read-only) corpus; the
  * marker fingerprint revalidates the layout on every session.
  */
object IndexDirs {

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]", "_")

  private def root: String =
    sys.props("java.io.tmpdir") + "/graft-index"

  def ivf(datasetKey: String, idCol: String, vecCol: String,
      k: Int): String =
    s"$root/ivf-${sanitize(datasetKey)}-${sanitize(idCol)}-" +
      s"${sanitize(vecCol)}-k$k"

  def lsh(datasetKey: String, idCol: String, vecCol: String,
      planes: Int, tables: Int): String =
    s"$root/lsh-${sanitize(datasetKey)}-${sanitize(idCol)}-" +
      s"${sanitize(vecCol)}-${planes}x$tables"
}
