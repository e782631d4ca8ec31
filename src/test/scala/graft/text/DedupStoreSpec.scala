package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained dedup-digest store (round 12): persisted
  * fingerprints + MinHash band buckets are bit-identical to a fresh
  * recompute, a grown corpus APPENDS only the new ids' digests (no
  * growth-refit threshold — digests are per-document), and the batch
  * screens read digests, never corpus text.
  */
class DedupStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def docs(from: Int, until: Int): DataFrame = {
    import spark.implicits._
    (from until until).map { i =>
      // Every 10th doc repeats an earlier text (exact dups to catch);
      // doc 7 carries null text (must be digestless, not md5("")).
      val text =
        if (i == 7) null
        else if (i % 10 == 9) s"common shared text body number ${i / 20}"
        else s"unique document $i with some words " +
          (0 to i % 5).map(j => s"tok$j").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  private def listing(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
      .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
  }

  private def rows(df: DataFrame): Set[(Long, String, Seq[Long])] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getSeq[Long](2))).toSet

  test("stored digests are bit-identical to a recompute; a second call " +
      "loads; a grown corpus appends without touching old files") {
    val dir = java.nio.file.Files.createTempDirectory("fpstore")
      .toString + "/store"
    val base = docs(0, 100)
    val s1 = DedupStore.loadOrBuild(base, "doc_id", "text", dir)
    // In-memory recompute (the Busy fallback path builds the same
    // frame) ≡ persisted bytes.
    val fresh2 = java.nio.file.Files.createTempDirectory("fpstore2")
      .toString + "/store"
    assert(rows(s1) == rows(DedupStore.loadOrBuild(base, "doc_id", "text",
      fresh2)))
    assert(s1.filter(col("doc_id") === 7L).isEmpty,
      "null-text docs carry no digest")
    assert(s1.count() == 99)

    val before = listing(dir)
    Thread.sleep(1100)
    DedupStore.loadOrBuild(base, "doc_id", "text", dir)
    assert(listing(dir) == before, "an up-to-date store must load, not rebuild")

    // +150% growth still appends: digests are per-document, so unlike
    // the IVF quantizer there is no quality argument for a refit.
    val grown = docs(0, 250)
    val sGrown = DedupStore.loadOrBuild(grown, "doc_id", "text", dir)
    val after = listing(dir)
    assert(before.forall { case (p, sig) => after.get(p).contains(sig) },
      "append must leave every pre-existing store file byte-untouched")
    assert(after.keySet.diff(before.keySet).nonEmpty)
    // Append-grown content ≡ a from-scratch build on the grown corpus.
    val freshDir = java.nio.file.Files.createTempDirectory("fpstoref")
      .toString + "/store"
    assert(rows(sGrown) ==
      rows(DedupStore.loadOrBuild(grown, "doc_id", "text", freshDir)),
      "append-grown store must equal a from-scratch build")
  }

  test("a held build lease degrades the store to in-memory digests") {
    val dir = java.nio.file.Files.createTempDirectory("fpbusy")
      .toString + "/store"
    val marker = graft.claims.MaintenanceLease.leasePathFor(dir)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.claims.MaintenanceLease.acquire(fs, marker, "other-builder",
      60L * 60 * 1000)
    try {
      val busy = DedupStore.loadOrBuild(docs(0, 50), "doc_id", "text", dir)
      assert(busy.count() == 49, "the busy fallback serves identical rows")
      assert(!new java.io.File(dir).exists(),
        "a busy builder must not write into the contested layout")
    } finally graft.claims.MaintenanceLease.release(fs, marker,
      "other-builder")
    // Lease released: the next call builds and persists normally.
    DedupStore.loadOrBuild(docs(0, 50), "doc_id", "text", dir)
    assert(new java.io.File(s"$dir/digests").exists())
  }

  test("deletion and config drift rebuild from scratch") {
    val dir = java.nio.file.Files.createTempDirectory("fpstore3")
      .toString + "/store"
    DedupStore.loadOrBuild(docs(0, 100), "doc_id", "text", dir)
    val pre = listing(dir).keySet
    val shrunk = DedupStore.loadOrBuild(docs(0, 80), "doc_id", "text", dir)
    assert(pre.intersect(listing(dir).keySet).isEmpty,
      "deletion must rewrite the store from scratch")
    assert(shrunk.count() == 79)
    val pre2 = listing(dir).keySet
    DedupStore.loadOrBuild(docs(0, 80), "doc_id", "text", dir, bands = 4)
    assert(pre2.intersect(listing(dir).keySet).isEmpty,
      "config drift must rewrite the store from scratch")
  }

  test("streaming ingest steps: cross-batch state, replay idempotence") {
    val tmp = java.nio.file.Files.createTempDirectory("fpingest").toString
    val storeDir = s"$tmp/store"
    val streamDir = s"$tmp/stream"
    val corpus = docs(0, 50)
    DedupStore.loadOrBuild(corpus, "doc_id", "text", storeDir)
    val store = spark.read.parquet(s"$storeDir/digests")

    import spark.implicits._
    // Batch 0: one corpus dup (screened), one fresh doc, one internal
    // dup pair (min id survives).
    val b0 = Seq(
      (100L, "unique document 3 with some words tok0 tok1 tok2 tok3"), // = corpus doc 3
      (101L, "fresh text one"),
      (102L, "fresh text two"),
      (103L, "fresh text two")).toDF("doc_id", "text")
    DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    def survivors(): Set[(Long, String)] =
      spark.read.parquet(streamDir).select("doc_id", "fp")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s0 = survivors()
    assert(s0.map(_._1) == Set(101L, 102L),
      s"batch 0: corpus dup out, internal dup collapses to min id: $s0")

    // Batch 1: a dup of a batch-0 SURVIVOR must be screened by the
    // streamed state, not just the corpus store.
    val b1 = Seq(
      (110L, "fresh text one"),  // dup of 101's content
      (111L, "fresh text three")).toDF("doc_id", "text")
    DedupStore.ingestBatch(b1, "doc_id", "text", store, streamDir, 1L)
    assert(survivors().map(_._1) == Set(101L, 102L, 111L),
      "batch 1: earlier batches' digests are stream state")

    // Replay of batch 0 (at-least-once foreachBatch): its own prior
    // output must NOT screen it — identical content, no loss.
    val before = survivors()
    DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    assert(survivors() == before,
      "a replayed batch overwrites its own dir with identical content")

    // Compaction folds the per-batch dirs into one negative-id
    // generation with identical content; ingest and replay still work
    // against the compacted state.
    def gens(): Set[String] =
      new java.io.File(streamDir).listFiles().toSeq
        .filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("batch_id=")).toSet
    DedupStore.compactStream(spark, streamDir, "doc_id")
    assert(gens() == Set("batch_id=-1"),
      s"compaction leaves exactly one negative generation: ${gens()}")
    assert(survivors() == before, "compaction must not change survivors")
    // Re-run: single compacted generation → no-op.
    DedupStore.compactStream(spark, streamDir, "doc_id")
    assert(gens() == Set("batch_id=-1") && survivors() == before)
    // Post-compaction replay of batch 0: its fps live in the compacted
    // generation now (not excluded), so it rewrites an EMPTY dir.
    DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    assert(survivors() == before,
      "post-compaction replay must not resurrect or lose survivors")
    // A genuinely new batch still screens against the compacted state.
    val b2 = Seq(
      (120L, "fresh text three"), // dup of 111 (now compacted)
      (121L, "fresh text four")).toDF("doc_id", "text")
    DedupStore.ingestBatch(b2, "doc_id", "text", store, streamDir, 2L)
    assert(survivors().map(_._1) == before.map(_._1) + 121L,
      "ingest after compaction screens against the compacted state")
  }

  test("stream→corpus promotion: the append path derives exactly the promoted digests") {
    // COVERAGE claims promotion needs no special verb — streamed
    // survivors landing in the corpus dataset make the store's append
    // path derive exactly their digests, from batch text only. This
    // pins that claim (round-12 verdict item 5): after promotion the
    // pre-existing digest files are byte-untouched (an append fired,
    // never a rebuild) and the added rows are precisely the promoted
    // ids' digests.
    val tmp = java.nio.file.Files.createTempDirectory("fppromo").toString
    val storeDir = s"$tmp/store"
    val streamDir = s"$tmp/stream"
    val corpus = docs(0, 50)
    DedupStore.loadOrBuild(corpus, "doc_id", "text", storeDir)
    val store = spark.read.parquet(s"$storeDir/digests")

    import spark.implicits._
    val b0 = Seq(
      (200L, "unique document 3 with some words tok0 tok1 tok2 tok3"),
      (201L, "promoted text alpha"),
      (202L, "promoted text beta"),
      (203L, "promoted text beta")).toDF("doc_id", "text")
    val b1 = Seq(
      (210L, "promoted text alpha"),
      (211L, "promoted text gamma")).toDF("doc_id", "text")
    DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    DedupStore.ingestBatch(b1, "doc_id", "text", store, streamDir, 1L)
    val promoted = spark.read.parquet(streamDir)
      .select("doc_id", "fp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(promoted.map(_._1) == Set(201L, 202L, 211L))

    // Promote: the survivors' (id, text) rows join the corpus dataset.
    val promotedDocs = b0.unionByName(b1)
      .join(spark.read.parquet(streamDir).select("doc_id"),
        Seq("doc_id"), "left_semi")
    val grown = corpus.unionByName(promotedDocs)

    val before = listing(s"$storeDir/digests")
    Thread.sleep(1100) // mtime resolution guard
    val after = DedupStore.loadOrBuild(grown, "doc_id", "text", storeDir)
    val afterFiles = listing(s"$storeDir/digests")
    // Append evidence: every pre-existing file byte-untouched, new
    // files added (a rebuild replaces the file set wholesale — the
    // deletion test above shows that shape).
    assert(before.forall { case (p, sig) => afterFiles.get(p).contains(sig) },
      "promotion must APPEND: pre-existing digest files byte-untouched")
    assert(afterFiles.keySet.diff(before.keySet).nonEmpty)
    // The added digests are exactly the promoted ids', bit-identical
    // to the streamed fingerprints they were admitted under. (The
    // pre-promotion roster is collected up front — a lazy re-read of
    // the store path could list the appended files too.)
    val preIds = corpus.filter(col("text").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val added = after.collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filterNot { case (id, _) => preIds.contains(id) }.toSet
    assert(added == promoted,
      "the appended digests must be exactly the promoted survivors'")
    assert(after.count() == preIds.size + promoted.size)
  }

  test("batch screens read the store's digests, never corpus text") {
    val tmp = java.nio.file.Files.createTempDirectory("fpscan").toString
    val corpusPath = s"$tmp/corpus"
    val storeDir = s"$tmp/store"
    docs(0, 100).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    DedupStore.loadOrBuild(corpus, "doc_id", "text", storeDir)
    // A later session: store loaded from disk, corpus text NOT in hand.
    val store = spark.read.parquet(s"$storeDir/digests")
    val batch = docs(100, 120)
      // doc 109 repeats corpus text ("...number 5" = docs 100-119 use
      // i/20 = 5; the corpus's doc 99 used 99/20 = 4) — make a true
      // cross-set exact dup explicitly:
      .unionByName(docs(89, 90).withColumn("doc_id", lit(500L)))

    val survivors = DedupStore.screenExactSurvivors(batch, "doc_id",
      "text", store)
    survivors.collect()
    val plan = survivors.queryExecution.executedPlan.toString
    assert(!plan.contains(corpusPath),
      s"the screen must not scan the corpus:\n${plan.take(800)}")
    assert(!"ReadSchema:[^\\n]*text".r.findFirstIn(plan).isDefined,
      s"no file scan of the screen may read a text column:\n${plan.take(800)}")
    // Column pruning must reach the store scan: the exact screen needs
    // only fp — reading bands (8 longs/row) too would triple the
    // store-side I/O at corpus scale.
    assert("ReadSchema: struct<fp:string>".r.findFirstIn(plan).isDefined,
      s"the store scan must be pruned to fp alone:\n${plan.take(800)}")
    // Semantics vs a brute recompute from both texts.
    val brute = {
      val fp = (df: DataFrame) => df.filter(col("text").isNotNull)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      fp(batch).join(fp(docs(0, 100)).select("fp"), Seq("fp"), "left_anti")
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select(col("doc_id"), col("fp"))
    }
    assert(survivors.exceptAll(brute).isEmpty &&
      brute.exceptAll(survivors).isEmpty,
      "store-backed screen must equal the text recompute")
    assert(survivors.filter(col("doc_id") === 500L).isEmpty,
      "the cross-set exact dup must be screened out")

    // Near-dup candidate screen: an exact dup shares ALL band buckets
    // with its stored twin — and the plan again reads no text column.
    val near = DedupStore.screenNearCandidates(batch, "doc_id", "text",
      store)
    val hit = near.filter(col("doc_id") === 500L && col("match_id") === 89L)
      .collect()
    assert(hit.length == 1 && hit(0).getLong(2) == 8L,
      "an exact dup must share all 8 band buckets with its stored twin")
    val nearPlan = near.queryExecution.executedPlan.toString
    assert(!nearPlan.contains(corpusPath) &&
      !"ReadSchema:[^\\n]*text".r.findFirstIn(nearPlan).isDefined,
      s"the near screen must not read corpus text:\n${nearPlan.take(800)}")
  }

  test("ingest and compaction share the stream lease: a foreign holder fails both loudly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fplease").toString
    val storeDir = s"$tmp/store"
    val streamDir = s"$tmp/stream"
    DedupStore.loadOrBuild(docs(0, 20), "doc_id", "text", storeDir)
    val store = spark.read.parquet(s"$storeDir/digests")
    val b0 = Seq((100L, "fresh text one")).toDF("doc_id", "text")
    // A compaction (or any other writer) holds the stream lease:
    // ingestBatch must fail loudly BEFORE any write — a silent merge
    // of a half-written batch dir is the race the lease closes.
    val marker = graft.claims.MaintenanceLease.leasePathFor(streamDir)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.claims.MaintenanceLease.acquire(fs, marker, "live-compactor",
      graft.claims.MaintenanceLease.defaultTtlMs)
    intercept[IllegalStateException] {
      DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    }
    intercept[IllegalStateException] {
      DedupStore.compactStream(spark, streamDir, "doc_id")
    }
    assert(!new java.io.File(streamDir).exists(),
      "the blocked ingest must not have written anything")
    graft.claims.MaintenanceLease.release(fs, marker, "live-compactor")
    DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    assert(spark.read.parquet(streamDir).count() == 1L,
      "after release the same ingest succeeds")
  }

  test("compaction staging stays a SIBLING of the root, trailing slash included") {
    // With a trailing slash the old `streamDir + \"__compacting\"`
    // landed INSIDE the partitioned root; a crash before the rename
    // then wedged every later stream read (mixed partition and
    // non-partition dirs under one root).
    assert(DedupStore.stagingFor("/x/stream") == "/x/stream__compacting")
    assert(DedupStore.stagingFor("/x/stream/") == "/x/stream__compacting")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fpslash").toString
    val storeDir = s"$tmp/store"
    val streamDir = s"$tmp/stream"
    DedupStore.loadOrBuild(docs(0, 20), "doc_id", "text", storeDir)
    val store = spark.read.parquet(s"$storeDir/digests")
    val b0 = Seq((100L, "fresh text one")).toDF("doc_id", "text")
    val b1 = Seq((101L, "fresh text two")).toDF("doc_id", "text")
    DedupStore.ingestBatch(b0, "doc_id", "text", store, streamDir, 0L)
    DedupStore.ingestBatch(b1, "doc_id", "text", store, streamDir, 1L)
    // Trailing-slash call converges and leaves nothing inside the root
    // but the compacted generation.
    DedupStore.compactStream(spark, s"$streamDir/", "doc_id")
    val entries = new java.io.File(streamDir).listFiles().toSeq
      .map(_.getName).filterNot(_.startsWith("_")).toSet
    assert(entries == Set("batch_id=-1"),
      s"only the compacted generation remains under the root: $entries")
    assert(spark.read.parquet(streamDir).count() == 2L)
  }
}
