package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the session-scoped build-once memo: one build per
  * (session, key), per-key isolation, sequential re-reads, and clear()
  * releasing pinned frames.
  */
class SessionCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("builds once per key and returns the same value") {
    val builds = new AtomicInteger(0)
    def get() = SessionCache.getOrBuild(spark, "sc-spec-a") {
      builds.incrementAndGet()
      (java.util.UUID.randomUUID().toString, Nil)
    }
    val first = get()
    assert(get() == first)
    assert(get() == first)
    assert(builds.get() == 1)
  }

  test("distinct keys build independently") {
    val b = SessionCache.getOrBuild(spark, "sc-spec-b") { ("b", Nil) }
    val c = SessionCache.getOrBuild(spark, "sc-spec-c") { ("c", Nil) }
    assert(b == "b" && c == "c")
  }

  test("concurrent same-key callers share one build") {
    val builds = new AtomicInteger(0)
    val results = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (0 until 8).map(_ => new Thread(() =>
      results.add(SessionCache.getOrBuild(spark, "sc-spec-d") {
        builds.incrementAndGet()
        Thread.sleep(50)
        ("d" + builds.get(), Nil)
      })))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(results.size == 1, s"divergent values: $results")
    assert(builds.get() == 1, s"built ${builds.get()} times")
  }

  test("clear releases pinned frames and forces a rebuild") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    def get() = SessionCache.getOrBuild(spark, "sc-spec-e") {
      builds.incrementAndGet()
      val df = Seq(1, 2, 3).toDF("x").persist()
      df.count()
      (df, Seq(df))
    }
    val df = get()
    assert(df.storageLevel.useMemory, "frame should be persisted")
    SessionCache.clear()
    assert(!df.storageLevel.useMemory, "clear() must unpersist pinned frames")
    get()
    assert(builds.get() == 2, "cleared entries rebuild")
    SessionCache.clear()
  }

  test("clear releases the blocks behind pinned CHECKPOINTED frames") {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    val get = () => SessionCache.getOrBuild(spark, "sc-spec-f") {
      val df = Checkpoint.pin(Seq(1, 2, 3).toDF("x"))
      (df, Seq(df))
    }
    val df = get()
    val rdds = df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty &&
      rdds.forall(_.getStorageLevel != StorageLevel.NONE))
    SessionCache.clear()
    assert(rdds.forall(_.getStorageLevel == StorageLevel.NONE),
      "clear() must drop checkpoint blocks, not only CacheManager persists")
  }

  test("bounded groups evict their oldest entry past the cap") {
    val builds = new AtomicInteger(0)
    def get(i: Int) = SessionCache.getOrBuildBounded(spark, s"sc-spec-g$i",
      group = "sc-spec-grp", maxPerGroup = 2) {
      builds.incrementAndGet()
      (s"v$i", Nil)
    }
    get(1); get(2)
    assert(builds.get() == 2)
    get(1) // warm hit — no rebuild, AND refreshes key 1's recency
    assert(builds.get() == 2)
    get(3) // cap 2: key 2 is now least-recently-used and evicts
    assert(builds.get() == 3)
    get(1); get(3) // still warm (1 was refreshed before the eviction)
    assert(builds.get() == 3)
    get(2) // evicted above — rebuilds
    assert(builds.get() == 4)
    SessionCache.clear()
  }
}
