package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized persisted-layout lifecycle (round 12): a seeded random
  * sequence of corpus evolutions — small appends, large appends,
  * deletions, replacements — driven through ONE long-lived layout,
  * asserting after every step that it serves exactly what a
  * from-scratch build on the current corpus serves. This is the
  * property the per-shape unit tests (IndexAppendSpec, DedupStoreSpec)
  * sample: no HISTORY of appends/rebuilds may leak into results.
  *
  * Seed sweeps: set GRAFT_PROP_SEED (same convention as
  * UploadFlowPropertySpec).
  */
class IndexLifecyclePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dim = 8
  private val seed =
    sys.env.get("GRAFT_PROP_SEED").map(_.toLong).getOrElse(42L)

  /** Deterministic per-id content, so any id set defines one corpus. */
  private def vectorsOf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val rnd = new scala.util.Random(i)
      (i, Seq.fill(dim)(rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  private def docsOf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val text =
        if (i % 13 == 7) null
        else if (i % 10 == 9) s"common shared body ${i / 30}"
        else s"doc $i " + (0 to (i % 4).toInt).map(j => s"w$j").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  /** One seeded evolution step over an id set. Mix weights: appends
    * dominate (the production case), with deletions/replacements
    * often enough that the escalation paths all fire across seeds.
    */
  private def evolve(ids: Set[Long], rnd: scala.util.Random,
      next: () => Long): (Set[Long], String) =
    rnd.nextInt(10) match {
      case r if r < 4 => // small append (under any refit threshold)
        val n = rnd.nextInt(15) + 1
        (ids ++ Seq.fill(n)(next()), s"append+$n")
      case r if r < 6 => // large append (past the IVF refit threshold)
        val n = (ids.size * 0.4).toInt + 1
        (ids ++ Seq.fill(n)(next()), s"bigAppend+$n")
      case r if r < 8 => // deletion
        val victims = rnd.shuffle(ids.toSeq).take(ids.size / 10 + 1)
        (ids -- victims, s"delete-${victims.size}")
      case _ => // replacement at ~constant count
        val victims = rnd.shuffle(ids.toSeq).take(ids.size / 20 + 1)
        (ids -- victims ++ Seq.fill(victims.size)(next()),
          s"replace${victims.size}")
    }

  test(s"IVF layout serves from-scratch results through 8 random " +
      s"evolutions (seed=$seed)") {
    val rnd = new scala.util.Random(seed)
    var nextId = 300L
    val next = () => { nextId += 1; nextId }
    var ids: Set[Long] = (0L until 300L).toSet
    val dir = java.nio.file.Files.createTempDirectory("ivflife")
      .toString + "/ix"
    val query = {
      import spark.implicits._
      Seq(Tuple1(Seq.fill(dim)(0.5))).toDF("qvec")
    }
    def top(a: DataFrame, cs: Array[Array[Double]]): Seq[(Long, Double)] =
      // nprobe = all cells: the exact setting, where results must not
      // depend on which centroids history left behind.
      IvfIndex.topK(a, cs, query, "vec_id", "embedding", k = 10,
        nprobe = cs.length)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    (1 to 8).foreach { step =>
      val (newIds, opName) = evolve(ids, rnd, next)
      ids = newIds
      val corpus = vectorsOf(ids.toSeq.sorted)
      val (a, cs) = IvfIndex.loadOrBuild(corpus, "vec_id", "embedding",
        8, dir)
      withClue(s"step $step ($opName, |ids|=${ids.size}): ") {
        assert(a.select("vec_id").collect().map(_.getLong(0)).toSet
          == ids, "layout id set must equal the corpus")
        assert(a.groupBy("vec_id").count()
          .filter(col("count") > 1).isEmpty, "no duplicate ids")
        val freshDir = java.nio.file.Files
          .createTempDirectory(s"ivflife$step").toString + "/ix"
        val (af, csf) = IvfIndex.loadOrBuild(corpus, "vec_id",
          "embedding", 8, freshDir)
        assert(top(a, cs) == top(af, csf),
          "full-probe top-k must equal a from-scratch build")
      }
    }
  }

  test(s"dedup-digest store equals a from-scratch store through 8 " +
      s"random evolutions (seed=$seed)") {
    val rnd = new scala.util.Random(seed + 1)
    var nextId = 200L
    val next = () => { nextId += 1; nextId }
    var ids: Set[Long] = (0L until 200L).toSet
    val dir = java.nio.file.Files.createTempDirectory("fplife")
      .toString + "/store"
    def rows(df: DataFrame): Set[(Long, String, Option[Seq[Long]])] =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getSeq[Long](2)))).toSet
    (1 to 8).foreach { step =>
      val (newIds, opName) = evolve(ids, rnd, next)
      ids = newIds
      val docs = docsOf(ids.toSeq.sorted)
      val s1 = graft.text.DedupStore.loadOrBuild(docs, "doc_id", "text",
        dir)
      withClue(s"step $step ($opName, |ids|=${ids.size}): ") {
        val freshDir = java.nio.file.Files
          .createTempDirectory(s"fplife$step").toString + "/store"
        val s2 = graft.text.DedupStore.loadOrBuild(docs, "doc_id",
          "text", freshDir)
        // Digests are content-pure: FULL set equality, not just query
        // equivalence.
        assert(rows(s1) == rows(s2),
          "maintained store must be bit-equal to a from-scratch build")
      }
    }
  }
}
