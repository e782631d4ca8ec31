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
}
