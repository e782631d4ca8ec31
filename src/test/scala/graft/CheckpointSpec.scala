package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The session-level materialization policy (VERDICT r8 #1): every
  * pinned kernel frame routes through [[Checkpoint.pin]], which is
  * `localCheckpoint` by default and a RELIABLE (replicated,
  * executor-loss-survivable) `checkpoint` under
  * `graft.checkpoint.reliable=true` — with identical kernel output on
  * both paths, a loud failure when the reliable path has no checkpoint
  * directory, and releasable storage either way.
  */
class CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private def withReliable[T](body: => T): T = {
    spark.conf.set(Checkpoint.ReliableConf, "true")
    try body finally spark.conf.unset(Checkpoint.ReliableConf)
  }

  // Declared FIRST: later tests set the context's checkpoint dir,
  // which cannot be unset on a shared SparkContext.
  test("reliable=true without a checkpoint dir fails loudly at pin time") {
    import spark.implicits._
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = Seq(1, 2, 3).toDF("v")
    withReliable {
      val e = intercept[IllegalArgumentException] { Checkpoint.pin(df) }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }

  private def ensureCheckpointDir(): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        Files.createTempDirectory("graft-ckpt").toString)

  test("span kernel output is identical under the reliable policy") {
    import spark.implicits._
    ensureCheckpointDir()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely unrelated text with no shared character windows"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    def run() = {
      val spans = graft.text.CurationOps
        .dupSpansChars(docs, "doc_id", "text", k = 10)
        .collect().map(_.toSeq).toSet
      val cuts = graft.text.CurationOps
        .spanCut(docs, "doc_id", "text", k = 10)
        .collect().map(_.toSeq).toSet
      (spans, cuts)
    }
    SessionCache.clear() // force a fresh local-policy build
    val local = run()
    SessionCache.clear() // drop the local-policy span frame
    val reliable = withReliable { run() }
    SessionCache.clear()
    assert(local == reliable)
    assert(local._1.nonEmpty && local._2.nonEmpty)
  }

  test("percentile kernel output is identical under the reliable policy") {
    import spark.implicits._
    ensureCheckpointDir()
    val rnd = new scala.util.Random(7)
    val df = (0 until 500)
      .map(i => (s"k${i % 3}", math.floor(rnd.nextDouble() * 40) / 2.0))
      .toDF("k", "v")
    def run() = graft.Stats.exactPercentilesByKey(df, Seq("k"), "v",
        Seq(0.25 -> "q1", 0.5 -> "med", 0.9 -> "p90"))
      .collect().map(_.toSeq).toSet
    val local = run()
    val reliable = withReliable { run() }
    assert(local == reliable && local.size == 3)
  }

  test("connected components converge identically under the reliable policy") {
    import spark.implicits._
    ensureCheckpointDir()
    // The iterative pin-per-round kernel the DedupJobs scaladoc names
    // as the reliable-checkpoint case on long cluster runs: a
    // diameter-3 chain plus a disjoint pair must yield the same
    // min-label components on both storage paths.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    // driverEdgeLimit = 0 forces the DISTRIBUTED iterative loop (the
    // path that pins per round); the driver union-find shortcut never
    // checkpoints.
    def run() = graft.text.DedupJobs
      .connectedComponents(edges, driverEdgeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = run()
    val reliable = withReliable { run() }
    assert(local == reliable)
    assert(local == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("reliable pins write to the checkpoint directory") {
    import spark.implicits._
    ensureCheckpointDir()
    val df = spark.range(100).toDF("v")
    val pinned = withReliable { Checkpoint.pin(df) }
    assert(pinned.count() == 100)
    // A reliable checkpoint's plan reads an RDD whose lineage was cut
    // at a ReliableCheckpointRDD over the checkpoint dir.
    val rdds = pinned.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty && rdds.forall(_.isCheckpointed))
    val dir = spark.sparkContext.getCheckpointDir.get
    assert(new java.io.File(new java.net.URI(dir).getPath).listFiles()
      .nonEmpty)
  }

  test("reliable pin survives losing its storage blocks; local cannot") {
    import spark.implicits._
    ensureCheckpointDir()
    // Failure injection (VERDICT r9 #4): drop every storage block
    // behind the pinned frame — the single-machine stand-in for
    // losing the executor that computed it. The local path holds the
    // ONLY copy in those blocks (lineage truncated, nothing to
    // recompute from), so the read must fail; the reliable path must
    // re-read its checkpoint FILES and return the identical frame —
    // the HA claim demonstrated, not inferred.
    def rddsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
    val local = Checkpoint.pin(spark.range(200).toDF("v"))
    assert(local.count() == 200)
    rddsOf(local).foreach(_.unpersist(blocking = true))
    val e = intercept[Exception] { local.count() }
    // Pin the SPECIFIC failure: the missing-checkpoint-block error,
    // somewhere in the cause chain — any other exception (analysis,
    // OOM) would make this contrast vacuous.
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage))
      .mkString("\n")
    assert(messages.contains("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND") ||
      messages.contains("Checkpoint block"),
      s"local pin must fail on the lost block, got: $messages")

    val rel = withReliable { Checkpoint.pin(spark.range(200).toDF("v")) }
    assert(rel.count() == 200)
    rddsOf(rel).foreach(_.unpersist(blocking = true))
    assert(rel.agg(org.apache.spark.sql.functions.sum("v")).collect()(0)
      .getLong(0) == (0L until 200L).sum,
      "reliable pin must read back from checkpoint files after block loss")
  }

  test("release drops the blocks behind a local pin") {
    import spark.implicits._
    val pinned = Checkpoint.pin(spark.range(50).toDF("v"))
    assert(pinned.count() == 50)
    val rdds = pinned.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty &&
      rdds.forall(_.getStorageLevel != StorageLevel.NONE))
    Checkpoint.release(pinned)
    assert(rdds.forall(_.getStorageLevel == StorageLevel.NONE))
  }

  test("isPinned demands a materialized checkpoint, not any RDD-backed frame") {
    import spark.implicits._
    // A bare createDataFrame(rdd) frame is a LogicalRDD with NOTHING
    // persisted — treating it as pinned would let a callee skip its
    // defensive pin and recompute a possibly nondeterministic lineage
    // per consuming job.
    val bare = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
      new org.apache.spark.sql.types.StructType()
        .add("v", org.apache.spark.sql.types.LongType))
    assert(!Checkpoint.isPinned(bare))
    assert(!Checkpoint.isPinned(spark.range(5).toDF("v")))
    val pinned = Checkpoint.pinTransient(spark.range(5).toDF("v"))
    try assert(Checkpoint.isPinned(pinned))
    finally Checkpoint.release(pinned)
  }
}
