package graft.vector

/** Canonical on-disk homes for the persisted vector indexes: derived
  * from the dataset key (usually the corpus dir) + the full index
  * config, so EVERY consumer with the same (corpus, id, vec, config)
  * converges on one shared layout — the IVF ANN entry, the recall
  * audit, and SemDeDup all reuse a single `ivf-…-k16` index.
  *
  * ROOT: `graft.index.root` (system property, else the env var
  * `GRAFT_INDEX_ROOT`) when set — a deployment should point this at a
  * durable location beside its warehouse, since tmp cleaners silently
  * drop the index (rebuild is correct but O(corpus); COVERAGE
  * documents the trade). The fallback is a PER-USER directory under
  * the JVM tmpdir: the shared `/tmp/graft-index` of the first cut let
  * another user on a multi-user host pre-create or poison the layout
  * (query results trust marker + parquet bytes with no ownership
  * check) and made cross-user permission collisions break the build
  * path (round-11 advice). Never beside the (read-only) corpus; the
  * marker fingerprint revalidates the layout on every session.
  */
object IndexDirs {

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]", "_")

  private[graft] def root: String =
    sys.props.get("graft.index.root")
      .orElse(sys.env.get("GRAFT_INDEX_ROOT"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-index-" +
        sanitize(sys.props.getOrElse("user.name", "anon")))

  def ivf(datasetKey: String, idCol: String, vecCol: String,
      k: Int): String =
    s"$root/ivf-${sanitize(datasetKey)}-${sanitize(idCol)}-" +
      s"${sanitize(vecCol)}-k$k"

  def lsh(datasetKey: String, idCol: String, vecCol: String,
      planes: Int, tables: Int): String =
    s"$root/lsh-${sanitize(datasetKey)}-${sanitize(idCol)}-" +
      s"${sanitize(vecCol)}-${planes}x$tables"

  /** Persisted text-dedup digest store ([[graft.text.DedupStore]]):
    * same root, same fingerprint-marker revalidation — the text twin
    * of the vector index homes.
    */
  def textDigests(datasetKey: String, idCol: String, textCol: String,
      k: Int, bands: Int, shingleN: Int): String =
    s"$root/fp-${sanitize(datasetKey)}-${sanitize(idCol)}-" +
      s"${sanitize(textCol)}-k$k-b$bands-n$shingleN"

  /** Scratch slot for a stream-maintenance rehearsal (one per
    * dataset key, REUSED and wiped by its owner each run — bounded
    * tmp usage, unlike a fresh createTempDirectory per session).
    */
  def streamScratch(datasetKey: String): String =
    s"$root/stream-${sanitize(datasetKey)}"

  /** Maintained dup-group component store
    * ([[graft.text.ComponentStore]]): same root and protocol.
    */
  def textComponents(datasetKey: String, idCol: String, textCol: String,
      k: Int, bands: Int, shingleN: Int, threshold: Double,
      maxBucket: Int): String =
    s"$root/cc-${sanitize(datasetKey)}-${sanitize(idCol)}-" +
      s"${sanitize(textCol)}-k$k-b$bands-n$shingleN" +
      s"-t${sanitize(threshold.toString)}-mb$maxBucket"
}
