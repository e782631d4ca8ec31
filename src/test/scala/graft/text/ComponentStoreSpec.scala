package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained dup-group component store (round 12): append-grown
  * components must equal the from-scratch connected components over
  * the same corpus (at spec scale no bucket cap bites, so the two
  * pair sets coincide exactly), merges land as PATH-COMPRESSED remap
  * rows over append-only members, and the store's accepted-edge log
  * re-derives the same components.
  */
class ComponentStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // Spec-wide pair criterion: τ=0.4, single-row bands (k=32, b=32) so
  // a band bucket collides whenever one signature slot agrees — the
  // most permissive deterministic screen, letting the constructed
  // bridge texts (concatenations, J≈0.45 to each side) surface as
  // candidates reliably. The kernel is deterministic: once a pair is
  // found for given texts, it is found on every run.
  private val K = 32
  private val B = 32
  private val N = 3
  private val T = 0.4

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private val tA = toks("alpha", 12)
  private val tB = toks("beta", 12)
  private val t0 = toks("zero", 12)
  private val tC = toks("gamma", 12)

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base: Seq[(Long, String)] = Seq(
    (0L, t0), (1L, tA), (2L, tB), (3L, toks("three", 10)),
    (4L, tA), (5L, null), (6L, ""), (7L, tB), (8L, toks("eight", 10)),
    (9L, toks("nine", 10)))

  private def fromScratch(docs: DataFrame): Set[(Long, Long)] =
    DedupJobs.connectedComponents(
      DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
        K, B, N, T, maxBucket = 100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def listing(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
      .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
  }

  test("build, append, merge, chain: store ≡ from-scratch CC at every step") {
    val tmp = java.nio.file.Files.createTempDirectory("ccstore").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"

    def stepDocs(rows: Seq[(Long, String)]): Map[Long, Long] = {
      val docs = df(rows)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      ComponentStore.loadOrBuild(docs, "doc_id", "text", ccDir, store,
        K, B, N, T, maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    def remap(): Set[(Long, Long)] =
      spark.read.parquet(s"$ccDir/remap")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Base: two dup groups {1,4}→1 and {2,7}→2; null/empty excluded.
    val c0 = stepDocs(base)
    assert(c0 == Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 7L -> 2L), s"base: $c0")
    assert(c0.toSet == fromScratch(df(base)), "base ≡ from-scratch")
    assert(remap().isEmpty, "no merges yet")

    // Append 1: a new dup of A (joins group 1, NO root merge) and a
    // fresh singleton. Members are append-only: base files untouched.
    val before = listing(s"$ccDir/members")
    val g1 = base ++ Seq((10L, tA), (11L, toks("eleven", 10)))
    val c1 = stepDocs(g1)
    assert(c1 == c0 + (10L -> 1L), s"append joins group 1: $c1")
    assert(c1.toSet == fromScratch(df(g1)), "append 1 ≡ from-scratch")
    assert(remap().isEmpty, "joining a group is not a root merge")
    val after = listing(s"$ccDir/members")
    assert(before.forall { case (p, m) => after.get(p).contains(m) },
      "members is append-only: base files keep their bytes")

    // Append 2: a bridge doc similar to BOTH A and B texts — roots 1
    // and 2 must merge to 1, via the remap, without touching members'
    // old rows.
    val g2 = g1 ++ Seq((13L, s"$tA $tB"))
    val c2 = stepDocs(g2)
    assert(c2 == Map(1L -> 1L, 4L -> 1L, 10L -> 1L, 13L -> 1L,
      2L -> 1L, 7L -> 1L), s"bridge merges both groups to min root: $c2")
    assert(c2.toSet == fromScratch(df(g2)), "append 2 ≡ from-scratch")
    assert(remap() == Set((2L, 1L)), s"one displaced root: ${remap()}")

    // Append 3: a dup of doc 0 creates group {0,17}→0, then a second
    // bridge merges THAT group with the big one — the old (2→1) entry
    // must recompress to (2→0): new_root is always final, no chains.
    val g3 = g2 ++ Seq((17L, t0), (18L, s"$t0 $tA"))
    val c3 = stepDocs(g3)
    val all0 = Set(0L, 1L, 2L, 4L, 7L, 10L, 13L, 17L, 18L)
    assert(c3.keySet == all0 && c3.values.toSet == Set(0L),
      s"everything reachable lands in component 0: $c3")
    assert(c3.toSet == fromScratch(df(g3)), "append 3 ≡ from-scratch")
    assert(remap() == Set((2L, 0L), (1L, 0L)),
      s"remap recompressed, no chains: ${remap()}")
    val rm = remap()
    assert(rm.map(_._2).intersect(rm.map(_._1)).isEmpty,
      "path-compressed: no new_root is itself remapped")

    // The store's accepted-edge log re-derives the same components —
    // the `_sound` contract.
    val fromEdges = DedupJobs.connectedComponents(
      ComponentStore.storedEdges(spark, ccDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromEdges == c3.toSet, "edge log ≡ resolved members⋈remap")

    // Unchanged corpus: fresh marker, loadOrBuild touches nothing.
    assert(ComponentStore.isFresh(df(g3), "doc_id", "text", ccDir,
      K, B, N, T, maxBucket = 100))
    val snap = listing(ccDir)
    stepDocs(g3)
    assert(listing(ccDir) == snap, "a fresh store is loaded, not rewritten")

    // Singletons never enter members (base doc 3 and appended doc 11
    // are unique texts).
    assert(!c3.contains(3L) && !c3.contains(11L))
    val g4 = g3 ++ Seq((20L, tC))
    val c4 = stepDocs(g4)
    assert(!c4.contains(20L), "an unpaired append stays out of members")

    // Crash window: a torn append (marker already invalidated, remap
    // half-rewritten to garbage) must be REBUILT on the next call —
    // the stamp-last discipline means no marker ever certifies the
    // torn state.
    import spark.implicits._
    new java.io.File(s"$ccDir/${ComponentStore.metaFile}").delete()
    Seq((999L, 777L)).toDF("old_root", "new_root")
      .write.mode("overwrite").parquet(s"$ccDir/remap")
    val c5 = stepDocs(g4)
    assert(c5.toSet == fromScratch(df(g4)),
      "rebuild discards the torn remap and re-derives clean components")
    assert(remap().isEmpty, "a fresh build starts with an empty remap")
  }

  test("rebaseline re-applies the skew cap corpus-wide, resetting monotone drift") {
    // The documented cap asymmetry, constructed: a bucket at the cap
    // (3 dups, maxBucket = 3) contributes its edges at the base build;
    // two late arrivals push the SAME bucket to 5 — the batch screen
    // keeps contributing edges (its candidates are batch-bounded, the
    // honest streaming semantics), while a from-scratch build now
    // drops the whole bucket. The store therefore drifts MONOTONE from
    // the from-scratch answer — and `rebaseline = true` is the policy
    // verb that resets it (round-12 watch-item c).
    val tmp = java.nio.file.Files.createTempDirectory("ccbase").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"
    val tX = toks("capped", 12)
    def run(rows: Seq[(Long, String)], rebaseline: Boolean = false) = {
      val docs = df(rows)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      ComponentStore.loadOrBuild(docs, "doc_id", "text", ccDir, store,
        K, B, N, T, maxBucket = 3, rebaseline = rebaseline)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def scratch(rows: Seq[(Long, String)]): Set[(Long, Long)] =
      DedupJobs.connectedComponents(
        DedupJobs.minhashCandidatePairs(df(rows), "doc_id", "text",
          K, B, N, T, maxBucket = 3))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val baseRows = Seq((0L, tX), (1L, tX), (2L, tX))
    assert(run(baseRows) == Set((0L, 0L), (1L, 0L), (2L, 0L)),
      "at-cap bucket contributes edges at the base build")
    val grownRows = baseRows ++ Seq((3L, tX), (4L, tX))
    val appended = run(grownRows)
    // The drift, pinned positively: the append KEPT the group (and
    // folded the late arrivals in) while from-scratch now drops it.
    assert(appended.map(_._1) == Set(0L, 1L, 2L, 3L, 4L),
      s"append keeps contributed edges under late arrivals: $appended")
    assert(scratch(grownRows).isEmpty,
      "from-scratch drops the over-cap bucket entirely")
    // Rebaseline: same corpus, same marker — the verb forces the
    // corpus-wide cap back on and the drift resets.
    assert(run(grownRows, rebaseline = true) == scratch(grownRows),
      "rebaseline ≡ from-scratch over the current corpus")
    // And the rebaselined layout serves subsequent loads as-is.
    assert(run(grownRows) == scratch(grownRows),
      "post-rebaseline loads are Fresh, not re-appended")
  }

  test("a crashed fold (staging present, members gone, no marker) rebuilds cleanly") {
    // The fold's delete→rename window: members deleted, staging not
    // yet renamed in, marker already invalidated (ensureWith deletes
    // it before appendStep runs). The next load must read that as
    // stale→rebuild, never consult the orphaned staging, and clean it
    // up so it cannot linger for the store's lifetime.
    val tmp = java.nio.file.Files.createTempDirectory("ccfoldcrash").toString
    val fpDir = s"$tmp/fp"
    val ccDir = s"$tmp/cc"
    def run(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
      val docs = df(rows)
      val store = DedupStore.loadOrBuild(docs, "doc_id", "text", fpDir,
        K, B, N)
      ComponentStore.loadOrBuild(docs, "doc_id", "text", ccDir, store,
        K, B, N, T, maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    run(base)
    // Simulate the crash window.
    import spark.implicits._
    new java.io.File(s"$ccDir/${ComponentStore.metaFile}").delete()
    val fs = new org.apache.hadoop.fs.Path(ccDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ccDir/members"), true)
    Seq((999L, 999L)).toDF("doc_id", "orig_root")
      .write.parquet(s"$ccDir/members__folding")
    // Heal on the grown corpus: full rebuild, clean components, the
    // orphaned staging gone.
    val g = base ++ Seq((10L, tA))
    assert(run(g) == fromScratch(df(g)),
      "the rebuild must re-derive clean components, ignoring staging")
    assert(!new java.io.File(s"$ccDir/members__folding").exists(),
      "the rebuild must clean up the crashed fold's staging dir")
    // And the healed layout serves the next load as-is.
    assert(run(g) == fromScratch(df(g)))
  }

  test("resolution broadcasts the remap — members never shuffle") {
    // At corpus scale members is large and the remap tiny (one row
    // per merged-away root): resolve must be a broadcast join, not a
    // members-side exchange.
    val tmp = java.nio.file.Files.createTempDirectory("ccplan").toString
    import spark.implicits._
    Seq((1L, 1L), (4L, 1L), (2L, 2L), (7L, 2L))
      .toDF("doc_id", "orig_root").write.parquet(s"$tmp/members")
    Seq((2L, 1L)).toDF("old_root", "new_root")
      .write.parquet(s"$tmp/remap")
    val resolved = ComponentStore.resolve(spark, tmp, "doc_id")
    val plan = resolved.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"resolution must broadcast the remap:\n${plan.take(600)}")
    assert(!plan.contains("SortMergeJoin"),
      s"members must not shuffle for resolution:\n${plan.take(600)}")
    assert(resolved.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 1L), (4L, 1L), (2L, 1L), (7L, 1L)))
  }

  test("footer row counts match count() across appends, without a job") {
    // The fold trigger reads these every append (round-15 advice:
    // the old read.parquet().count() was two Spark jobs per append);
    // the footer sum must stay exact across multi-file appends, and a
    // dataset that never appended reads as zero.
    val tmp = java.nio.file.Files.createTempDirectory("ccfooter").toString
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("x").write.parquet(s"$tmp/ds")
    Seq(4L, 5L).toDF("x").repartition(2)
      .write.mode("append").parquet(s"$tmp/ds")
    assert(ComponentStore.footerRowCount(spark, s"$tmp/ds") ===
      spark.read.parquet(s"$tmp/ds").count())
    assert(ComponentStore.footerRowCount(spark, s"$tmp/missing") === 0L)
  }
}
