package graft

import java.lang.ref.WeakReference

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for expensive shared artifacts — IVF cell
  * assignments, MinHash verified pairs, n-gram candidate pairs — that
  * several driver entries consume (build-once/read-many: the local
  * analog of a materialized index layout on a cluster).
  *
  * Lifetime contract: an entry lives as long as its owning SparkSession.
  * Sessions are held by IDENTITY through a [[WeakReference]] and every
  * access sweeps entries whose session is stopped or collected, so a
  * long-lived JVM hosting many short sessions cannot accumulate dead
  * cached plans, and a recycled `identityHashCode` can never hand back a
  * frame bound to a dead session (the entry's weak ref is compared `eq`
  * to the caller's session, not by hash).
  *
  * Persisted frames an entry pins are recorded so eviction can
  * `unpersist` them when the owning session is still alive (identity
  * collision replacement) — when the session is already stopped its
  * block manager is gone and dropping the reference suffices.
  */
object SessionCache {

  private final case class Entry(
      session: WeakReference[SparkSession],
      value: Any,
      pinned: Seq[DataFrame])

  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  private def release(e: Entry): Unit = {
    val s = e.session.get
    if (s != null && !s.sparkContext.isStopped)
      e.pinned.foreach(df =>
        try df.unpersist() catch { case _: Exception => () })
  }

  private def sweep(): Unit = {
    val dead = entries.collect {
      case (k, e) if e.session.get == null ||
        e.session.get.sparkContext.isStopped => k
    }.toSeq
    dead.foreach(entries.remove)
  }

  /** Return the cached value for (session, key), building and caching it
    * on miss. `build` returns the value plus the persisted frames it
    * pinned (so eviction can release them). Builds run under the cache
    * lock — concurrent callers of the same key block rather than
    * duplicating a multi-second index build, matching
    * `ConcurrentHashMap.computeIfAbsent` semantics.
    */
  def getOrBuild[T](spark: SparkSession, key: String)(
      build: => (T, Seq[DataFrame])): T = synchronized {
    sweep()
    val full = s"${System.identityHashCode(spark)}|$key"
    entries.get(full) match {
      case Some(e) if e.session.get != null && (e.session.get eq spark) =>
        e.value.asInstanceOf[T]
      case stale =>
        stale.foreach(release) // identity-hash collision from a live session
        val (v, pinned) = build
        entries(full) = Entry(new WeakReference(spark), v, pinned)
        v
    }
  }

  /** Evict everything (test hygiene). */
  def clear(): Unit = synchronized {
    entries.values.foreach(release)
    entries.clear()
  }
}
