package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized evolution for the maintained component store: seeded
  * batches drawing from a small text pool (duplicates common by
  * construction) plus occasional two-text BRIDGES (concatenations
  * whose Jaccard to each side clears the τ=0.4 criterion) must keep
  * the store equal to the from-scratch connected components over the
  * grown corpus after EVERY append — merges, multi-way merges, and
  * merge chains arise from the randomness instead of being
  * hand-picked. The generative counterpart of ComponentStoreSpec.
  */
class ComponentStorePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val K = 32
  private val B = 32
  private val N = 3
  private val T = 0.4

  private val pool: IndexedSeq[String] = (0 until 8).map(g =>
    (0 until 12).map(i => s"g${g}w$i").mkString(" "))

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fromScratch(docs: DataFrame): Set[(Long, Long)] =
    DedupJobs.connectedComponents(
      DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
        K, B, N, T, maxBucket = 1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("random dup/bridge evolutions: store ≡ from-scratch CC after every append") {
    val seed = sys.env.get("GRAFT_PROP_SEED").map(_.toLong).getOrElse(5L)
    val rnd = new scala.util.Random(seed)
    val tmp = java.nio.file.Files.createTempDirectory("ccprop").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"

    var corpus = Vector.empty[(Long, String)]
    var nextId = 0L
    def newRow(): (Long, String) = {
      val t = rnd.nextInt(10) match {
        case 0 => null                               // digestless
        case 1 | 2 =>                                 // bridge
          val a = rnd.nextInt(pool.length)
          val b = (a + 1 + rnd.nextInt(pool.length - 1)) % pool.length
          s"${pool(a)} ${pool(b)}"
        case _ => pool(rnd.nextInt(pool.length))      // plain dup
      }
      val r = (nextId, t); nextId += 1; r
    }

    def stepAndCheck(label: String): Unit = {
      val docs = df(corpus)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      val got = ComponentStore.loadOrBuild(docs, "doc_id", "text",
        ccDir, store, K, B, N, T, maxBucket = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == fromScratch(docs), s"seed=$seed $label diverged")
      // Structural invariants on every state: path-compressed remap,
      // edge log re-derives the same components.
      val rm = spark.read.parquet(s"$ccDir/remap")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rm.map(_._2).intersect(rm.map(_._1)).isEmpty,
        s"seed=$seed $label: remap has chains")
      val fromEdges = DedupJobs.connectedComponents(
        ComponentStore.storedEdges(spark, ccDir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fromEdges == got, s"seed=$seed $label: edge log drifted")
    }

    corpus ++= (0 until 8).map(_ => newRow())
    stepAndCheck("base")
    for (step <- 0 until 6) {
      corpus ++= (0 until 1 + rnd.nextInt(4)).map(_ => newRow())
      stepAndCheck(s"append $step")
    }
  }

  test("remap fold (threshold=1): resolve-equality holds across every fold, remap returns to 0") {
    // Round-13 fold: with the threshold at 1, EVERY append that merges
    // any root immediately folds the remap into members — the same
    // randomized evolution must stay ≡ from-scratch CC, and the remap
    // dataset must be EMPTY after every such append (the driver-side
    // table stops growing with the store's lifetime).
    val seed = sys.env.get("GRAFT_PROP_SEED").map(_.toLong).getOrElse(7L)
    val rnd = new scala.util.Random(seed)
    val tmp = java.nio.file.Files.createTempDirectory("ccfold").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"

    // A LARGER pool than the first test's: with 8 groups and common
    // bridges everything collapses into one component at the base
    // build, after which every later merge is a no-op and the fold
    // never fires. 24 groups keep distinct components alive so
    // cross-component merges (→ displaced roots → folds) land in the
    // APPEND steps, which is what this pin is about.
    val bigPool: IndexedSeq[String] = (0 until 24).map(g =>
      (0 until 12).map(i => s"g${g}w$i").mkString(" "))
    var corpus = Vector.empty[(Long, String)]
    var nextId = 0L
    def newRow(): (Long, String) = {
      val t = rnd.nextInt(10) match {
        case 0 => null
        case 1 | 2 | 3 =>                              // bridge-heavy mix
          val a = rnd.nextInt(bigPool.length)
          val b = (a + 1 + rnd.nextInt(bigPool.length - 1)) % bigPool.length
          s"${bigPool(a)} ${bigPool(b)}"
        case _ => bigPool(rnd.nextInt(bigPool.length))
      }
      val r = (nextId, t); nextId += 1; r
    }

    def remapCount(): Long = spark.read.parquet(s"$ccDir/remap").count()

    var foldsSeen = 0
    def stepAndCheck(label: String): Unit = {
      val docs = df(corpus)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      val got = ComponentStore.loadOrBuild(docs, "doc_id", "text",
        ccDir, store, K, B, N, T, maxBucket = 1000,
        remapFoldThreshold = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == fromScratch(docs), s"seed=$seed $label diverged")
      // Edge-log re-derivation must survive folds too.
      val fromEdges = DedupJobs.connectedComponents(
        ComponentStore.storedEdges(spark, ccDir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fromEdges == got, s"seed=$seed $label: edge log drifted")
      // The fold contract: the remap never survives an append at
      // threshold 1 — any merge is folded into members immediately.
      assert(remapCount() == 0,
        s"seed=$seed $label: remap has ${remapCount()} rows after fold")
    }

    def membersNow(): Map[Long, Long] =
      spark.read.parquet(s"$ccDir/members")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // The base seeds TWO crafted components (groups 20 and 21, two
    // docs each) alongside the random rows: a fold needs an append
    // that merges EXISTING components (displaced root → remap row →
    // fold at threshold 1), and a purely random evolution can spend
    // every merge on never-paired singletons, which displace nothing.
    corpus ++= (0 until 10).map(_ => newRow())
    corpus ++= Seq(bigPool(20), bigPool(20), bigPool(21), bigPool(21))
      .map { t => val r = (nextId, t); nextId += 1; r }
    stepAndCheck("base")
    var prevMembers = membersNow()
    def foldFired(label: String): Unit = {
      val now = membersNow()
      // Only a FOLD rewrites an existing member's stamped root —
      // plain appends only add rows.
      if (prevMembers.exists { case (id, root) =>
          now.get(id).exists(_ != root) }) foldsSeen += 1
      prevMembers = now
    }
    for (step <- 0 until 6) {
      corpus ++= (0 until 2 + rnd.nextInt(3)).map(_ => newRow())
      stepAndCheck(s"append $step")
      foldFired(s"append $step")
    }
    // Deterministic finale: one bridge doc merges the two crafted
    // components — the larger root is displaced, the remap gains a
    // row, and at threshold 1 the fold MUST rewrite the displaced
    // members in place.
    corpus :+= { val r = (nextId, s"${bigPool(20)} ${bigPool(21)}")
      nextId += 1; r }
    stepAndCheck("bridge finale")
    foldFired("bridge finale")
    assert(foldsSeen > 0, s"seed=$seed: no fold ever fired — " +
      "the crafted-components bridge must displace a root")
  }

  test("legacy store without a witness is backfilled at its first fold") {
    // Upgrade path (round-16 review): a store written by a binary that
    // predates the accept-time witness has raw history but no
    // edges_witness dir. Its FIRST fold must sample the pre-fold edge
    // log before rewriting it — otherwise that history is folded away
    // unsampled and the _sound audit loses independent force over it.
    val tmp = java.nio.file.Files.createTempDirectory("cclegacy").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"
    var corpus = Vector.empty[(Long, String)]
    var nextId = 0L
    def add(texts: Seq[String]): Unit = texts.foreach { t =>
      corpus :+= ((nextId, t)); nextId += 1
    }
    def run(): Set[(Long, Long)] = {
      val docs = df(corpus)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      ComponentStore.loadOrBuild(docs, "doc_id", "text", ccDir, store,
        K, B, N, T, maxBucket = 1000, edgeFoldSlack = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // Dup-heavy base: many raw pairs per component, so the next append
    // is guaranteed to fold.
    add((0 until 4).map(_ => pool(0)) ++ (0 until 4).map(_ => pool(1)))
    run()
    // Simulate the legacy store: the raw log exists, the witness does
    // not (delete BOTH generations of the store's witness files).
    val fs = new org.apache.hadoop.fs.Path(ccDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ccDir, "edges_witness"), true)
    assert(ComponentStore.witnessEdges(spark, ccDir).count() == 0)
    // Append → accept-time refresh would only cover the NEW batch; the
    // first fold must have backfilled the pre-fold log too.
    add(Seq(pool(2), pool(2), pool(2)))
    val got = run()
    val witness = ComponentStore.witnessEdges(spark, ccDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(witness.nonEmpty, "legacy store folded without a backfill")
    assert(witness.length <= 4096)
    val comp = fromScratch(df(corpus)).toMap
    witness.foreach { case (a, b) =>
      assert(comp.get(a).nonEmpty && comp(a) == comp(b),
        s"backfilled witness pair ($a,$b) does not co-resolve")
    }
    // The backfill covered PRE-append history, not just the new batch:
    // some sampled pair must join two of the original pool(0)/pool(1)
    // docs (ids below the append frontier on both ends).
    val frontier = corpus.length - 3L
    assert(witness.exists { case (a, b) => a < frontier && b < frontier },
      "backfill sampled only the post-upgrade batch")
    assert(got == comp.toSet)
  }

  test("edge-log fold (slack=0): log stays spanning-bounded, CC re-derivation holds across folds") {
    // Round-14 fold: with the slack at 0, EVERY append that leaves the
    // log above its spanning size immediately compacts it to the star
    // of the resolved components. The same randomized evolution must
    // stay ≡ from-scratch CC, the log-derived components must keep
    // matching resolve() ACROSS fold boundaries (star from fold N,
    // then raw pairs appended, then fold N+1 …), and the log must
    // never exceed the members row count after an append.
    val seed = sys.env.get("GRAFT_PROP_SEED").map(_.toLong).getOrElse(11L)
    val rnd = new scala.util.Random(seed)
    val tmp = java.nio.file.Files.createTempDirectory("ccefold").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"
    var corpus = Vector.empty[(Long, String)]
    var nextId = 0L
    def newRow(): (Long, String) = {
      val t = rnd.nextInt(10) match {
        case 0 => null
        case 1 | 2 | 3 =>
          val a = rnd.nextInt(pool.length)
          val b = (a + 1 + rnd.nextInt(pool.length - 1)) % pool.length
          s"${pool(a)} ${pool(b)}"
        case _ => pool(rnd.nextInt(pool.length))
      }
      val r = (nextId, t); nextId += 1; r
    }
    def edgeCount(): Long = spark.read.parquet(s"$ccDir/edges").count()
    def memberCount(): Long = spark.read.parquet(s"$ccDir/members").count()
    var foldedOnce = false
    def stepAndCheck(label: String): Unit = {
      val docs = df(corpus)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      val got = ComponentStore.loadOrBuild(docs, "doc_id", "text",
        ccDir, store, K, B, N, T, maxBucket = 1000, edgeFoldSlack = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == fromScratch(docs), s"seed=$seed $label diverged")
      // Mirror the driver audit exactly (round-15): the log UNIONED
      // with the pre-fold witness sample must re-derive the same
      // components — the witness is what stays independently binding
      // over history the star has folded away.
      val fromEdges = DedupJobs.connectedComponents(
        ComponentStore.storedEdges(spark, ccDir)
          .unionByName(ComponentStore.witnessEdges(spark, ccDir)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fromEdges == got, s"seed=$seed $label: edge log drifted")
      ()
    }
    // A dup-heavy base: many pairs per component, so the raw log
    // starts well above spanning size and the first append must fold.
    corpus ++= (0 until 12).map(_ => newRow())
    corpus ++= Seq(pool(0), pool(0), pool(0), pool(1), pool(1))
      .map { t => val r = (nextId, t); nextId += 1; r }
    stepAndCheck("base")
    // Round-16: the witness is seeded at BUILD time from the raw pair
    // log (and refreshed per accepting append) — never sampled from
    // the post-fold log, where star rows would dilute it. The
    // dup-heavy base has raw pairs, so the sample must already exist
    // here, before any fold has fired.
    assert(ComponentStore.witnessEdges(spark, ccDir).count() > 0,
      s"seed=$seed: witness not seeded at build time")
    for (step <- 0 until 6) {
      corpus ++= (0 until 2 + rnd.nextInt(3)).map(_ => newRow())
      stepAndCheck(s"append $step")
      val (e, m) = (edgeCount(), memberCount())
      assert(e <= m,
        s"seed=$seed append $step: edge log $e rows > members $m — " +
          "fold did not bound the log")
      // Post-fold the star has members − #components rows, strictly
      // below members (every component has ≥ 2 docs) — observing the
      // strict gap proves a fold actually rewrote the log, since the
      // dup-heavy base's raw pair log starts ABOVE members.
      foldedOnce = foldedOnce || e < m
    }
    assert(foldedOnce, s"seed=$seed: fold never observed")
    // The fold left a bounded, non-empty raw-pair witness: every
    // sampled pair is a genuine pre-fold acceptance, and the cap keeps
    // the sample one slab-sized regardless of how many folds ran.
    val witness = ComponentStore.witnessEdges(spark, ccDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(witness.nonEmpty, s"seed=$seed: fold left no witness sample")
    assert(witness.length <= 4096)
    val comp = fromScratch(df(corpus)).toMap
    witness.foreach { case (a, b) =>
      assert(comp.get(a).nonEmpty && comp(a) == comp(b),
        s"seed=$seed: witness pair ($a,$b) does not co-resolve")
    }
  }
}
