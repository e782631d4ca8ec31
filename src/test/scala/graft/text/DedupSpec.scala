package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private def docs() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the evening comes and the stars appear in the sky"
    val nearDup = base.replace("quick", "speedy") // one word differs
    val distinct1 = "completely different content about spark catalyst " +
      "optimizer rules and physical execution strategies for joins"
    val distinct2 = "a third unrelated document mentioning parquet column " +
      "pruning predicate pushdown and shuffle partitions tuning"
    Seq(
      (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2),
      (4L, base) // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val g = DedupJobs.exactDupGroups(docs(), "doc_id", "text")
    val dup = g.filter(col("n_docs") > 1).collect()
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("keep_id") == 0L)
    assert(dup(0).getAs[Long]("n_docs") == 2L)
  }

  test("minhash LSH finds near-duplicate pair and not distinct docs") {
    val pairs = DedupJobs.minhashCandidatePairs(
      docs(), "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"near-dup pair missing; got $pairs")
    assert(pairs.contains((0L, 4L)), s"exact-dup pair missing; got $pairs")
    assert(!pairs.contains((2L, 3L)), s"false positive; got $pairs")
  }

  test("minhash dup groups map near-dups to one survivor") {
    val g = DedupJobs.minhashDupGroups(docs(), "doc_id", "text", threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(0L) == 0L && g(1L) == 0L && g(4L) == 0L)
    assert(g(2L) == 2L && g(3L) == 3L)
  }

  test("simhash near-dups within hamming distance") {
    val pairs = DedupJobs.simhashNearDups(docs(), "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)), s"exact dup must have hamming 0; got $pairs")
    assert(pairs.contains((0L, 1L)), s"near dup expected within 8 bits; got $pairs")
  }

  test("simhash degenerate block stays bounded under maxBucket cap") {
    import spark.implicits._
    // All-identical texts: every doc lands in the same block buckets.
    // Uncapped this is m²/2 pairs from one bucket — over the cap the
    // bucket must degrade to linear STAR pairs around the min-id member
    // (hot duplicate-dense buckets stay connected, never silently
    // vanish), and a permissive cap must return exactly the all-pairs
    // set.
    val same = (0L until 20L).map(i => (i, "identical text repeated here"))
      .toDF("doc_id", "text")
    val capped = DedupJobs.simhashNearDups(same, "doc_id", "text",
      maxHamming = 3, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (1L until 20L).map(i => (0L, i)).toSet,
      s"over-cap bucket must emit star pairs around doc 0; got $capped")
    val open = DedupJobs.simhashNearDups(same, "doc_id", "text",
      maxHamming = 3, maxBucket = 1000).count()
    assert(open == 190L, s"20 identical docs → C(20,2)=190 pairs, got $open")
  }

  test("simhash block-combination guarantee holds vs brute force") {
    import spark.implicits._
    // Perturbed copies of one base text: many pairs land in the 1..6
    // bit Hamming band. The (8, 2) combination scheme guarantees exact
    // recall to 6 bits — blocked results must equal brute force.
    val base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa").split(" ")
    val variants = (0 until 30).map { i =>
      val repl = base.zipWithIndex.map { case (w, j) =>
        if (j % 7 == i % 7 && i % 3 != 0) w + "x" else w
      }
      (i.toLong, repl.mkString(" "))
    }
    val df = variants.toDF("doc_id", "text")
    val blocked = DedupJobs.simhashNearDups(df, "doc_id", "text",
      maxHamming = 6, blocks = 8, comboSize = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = df.select(col("doc_id"),
      graft.text.TextFunctions.simhash64(col("text")).as("sh"))
    val brute = sigs.alias("x").join(sigs.alias("y"),
        col("x.doc_id") < col("y.doc_id"))
      .filter(graft.text.TextFunctions.hamming64(col("x.sh"), col("y.sh")) <= 6)
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missing=${brute -- blocked} extra=${blocked -- brute}")
  }

  test("ngram jaccard prefix-filter join equals brute force all-pairs") {
    import spark.implicits._
    // Docs with overlapping token runs so several pairs straddle the
    // τ=0.5 boundary; the prefix-filtered candidate join + verification
    // must reproduce the brute-force all-pairs result exactly, both
    // with the common-gram demotion active (cap 3) and disabled (cap 0).
    val words = Seq("red", "blue", "green", "gold", "iron", "clay",
      "moss", "rain", "dust", "wind", "salt", "pine")
    val ds = (0 until 12).map { i =>
      val toks = (0 until 10).map(j => words((i * 3 + j) % words.size))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val sh = graft.text.TextFunctions.shingles(col("text"), 2)
    val withSh = ds.select(col("doc_id"), sh.as("sh"))
    val brute = withSh.alias("a").join(withSh.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", graft.text.TextFunctions.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"), round(col("j"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (cap <- Seq(0, 3)) {
      val got = DedupJobs.ngramJaccardPairs(ds, "doc_id", "text",
        Seq("lang"), n = 2, threshold = 0.5, commonGramCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"cap=$cap missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("cosine near-dup with tiny broadcast blocks equals single-block result") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.98f, 0.2f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    def run(blockSize: Int) = graft.vector.VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", 0.9, broadcastBlockSize = blockSize)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(2) == run(1000))
    assert(run(2) == Set((0L, 1L), (2L, 3L)))
  }

  test("connected components closes transitive chains") {
    import spark.implicits._
    // chain 7-3-2-1 (diameter 3: needs real iteration, not one-pass
    // min-neighbor) plus a separate pair and an untouched node space
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 3L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      5L -> 5L, 6L -> 5L)
    // driver union-find path (default limit)
    val cc = DedupJobs.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == expected, s"got $cc")
    // distributed min-label loop (limit forced to 0) must agree
    val ccDist = DedupJobs.connectedComponents(pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDist == expected, s"got $ccDist")
  }

  test("LSH near-dup finds planted duplicates, equals exact pairs here") {
    import spark.implicits._
    // 8-dim so the fixed hyperplanes split the space meaningfully;
    // identical vectors (0,1) MUST collide in every table, the
    // near-identical pair (2,3) shares a bucket with overwhelming
    // (and, with fixed hyperplanes, deterministic) probability, and
    // orthogonal vectors must never verify.
    val base = Array(0.6f, 0.2f, -0.4f, 0.1f, 0.9f, -0.3f, 0.2f, 0.5f)
    val near = base.clone(); near(1) = 0.21f
    val vecs = Seq(
      (0L, base), (1L, base.clone()), (2L, base.clone()), (3L, near),
      (4L, Array(-0.6f, 0.2f, 0.4f, 0.1f, -0.9f, -0.3f, -0.2f, 0.5f)),
      (5L, Array(0.1f, -0.8f, 0.0f, 0.7f, 0.0f, 0.4f, -0.5f, 0.1f))
    ).toDF("vec_id", "embedding")
    val lsh = graft.vector.VectorOps.lshNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.9, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.vector.VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 1L)) && exact.contains((2L, 3L)))
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
  }

  test("LSH near-dup star-pair degrade keeps hot buckets connected") {
    import spark.implicits._
    // 600 identical vectors: every bucket is one hot 600-member bucket
    // in all 8 tables — over maxBucket=1000? No: set cap low (8) to
    // force the star branch; all must still connect to the hub id 0.
    val v = Array(0.3f, -0.7f, 0.5f, 0.2f)
    val vecs = (0L until 40L).map(i => (i, v.clone())).toDF("vec_id", "embedding")
    val pairs = graft.vector.VectorOps.lshNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.9, dim = 4, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((1L until 40L).forall(i => pairs.contains((0L, i))),
      s"star pairs must connect every dup to the hub; got ${pairs.size} pairs")
  }

  test("ngram jaccard pairs verify blocked near-dups") {
    import spark.implicits._
    val blocked = docs().withColumn("lang", lit("en"))
    val pairs = DedupJobs.ngramJaccardPairs(blocked, "doc_id", "text",
      Seq("lang"), n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 4L)))
    assert(!pairs.contains((2L, 3L)))
  }

  test("SemDeDup drops all-but-first of each duplicate group, audit is empty") {
    import spark.implicits._
    // Two far-apart directions; exact duplicates planted in each. The
    // quantizer must co-locate identical vectors, so the greedy rule
    // keeps the min id of each group; the distinct directions survive
    // (pairwise cosine 0 < tau).
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val e3 = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val vecs = Seq(
      (0L, e1), (1L, e1.clone()), (2L, e1.clone()), // group of 3: drop 2
      (3L, e2), (4L, e2.clone()),                   // group of 2: drop 1
      (5L, e3)                                      // singleton: kept
    ).toDF("vec_id", "embedding")
    val sum = graft.vector.SemDedup.summary(vecs, "vec_id", "embedding",
        k = 2, tau = 0.95, datasetKey = "semdedup-spec")
      .collect()
    assert(sum.map(_.getAs[Long]("n_vecs")).sum == 6L)
    assert(sum.map(_.getAs[Long]("n_dropped")).sum == 3L)
    assert(sum.map(_.getAs[Long]("n_kept")).sum == 3L)
    assert(sum.map(_.getAs[Long]("n_unexamined")).sum == 0L,
      "under-cap cells must be fully examined")
    val violations = graft.vector.SemDedup.soundViolations(vecs,
      "vec_id", "embedding", k = 2, tau = 0.95,
      datasetKey = "semdedup-spec")
    assert(violations.count() == 0L)
  }

  test("SemDeDup greedy keeps the far end of a similarity chain") {
    import spark.implicits._
    // u(0°) – v(25°) – w(50°) at tau=0.9: cos(u,v)=cos(v,w)≈0.906 ≥ τ,
    // cos(u,w)≈0.643 < τ. True greedy keep-first keeps {u, w} (v is
    // dropped against kept u; w is checked against KEPT vectors only,
    // and u is not τ-close). The naive "drop if any smaller id is
    // τ-close" rule would wrongly drop w too.
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0.0f, 0.0f)
    }
    val vecs = Seq((0L, at(0)), (1L, at(25)), (2L, at(50)))
      .toDF("vec_id", "embedding")
    val sum = graft.vector.SemDedup.summary(vecs, "vec_id", "embedding",
        k = 1, tau = 0.9, datasetKey = "semdedup-chain")
      .collect()
    assert(sum.map(_.getAs[Long]("n_vecs")).sum == 3L)
    assert(sum.map(_.getAs[Long]("n_kept")).sum == 2L,
      "greedy must keep u and w, dropping only v")
    assert(graft.vector.SemDedup.soundViolations(vecs, "vec_id",
      "embedding", k = 1, tau = 0.9,
      datasetKey = "semdedup-chain").count() == 0L)
  }

  test("SemDeDup hot cell degrades loudly under the maxCell cap") {
    import spark.implicits._
    // The quantizer-skew rehearsal: 5,000 identical-direction vectors
    // all land in ONE cell (real corpora produce such hot cells via
    // mode collapse / boilerplate embeddings). Under maxCell = 64 the
    // streaming greedy must examine exactly the first 64 ids (keep id
    // 0, drop the 63 τ-close followers), keep every later row
    // UNEXAMINED with the degrade counted in n_unexamined — bounded
    // memory, no silent drops — and the soundness audit (examined
    // kept×kept pairs only) must stay empty.
    val v = Array(0.5f, -0.25f, 0.8f, 0.1f)
    val vecs = (0L until 5000L).map(i => (i, v.clone()))
      .toDF("vec_id", "embedding")
    val sum = graft.vector.SemDedup.summary(vecs, "vec_id", "embedding",
        k = 1, tau = 0.9, datasetKey = "semdedup-hotcell", maxCell = 64)
      .collect()
    assert(sum.map(_.getAs[Long]("n_vecs")).sum == 5000L)
    assert(sum.map(_.getAs[Long]("n_dropped")).sum == 63L,
      "the examined prefix must drop all but the first of 64 clones")
    assert(sum.map(_.getAs[Long]("n_kept")).sum == 4937L)
    assert(sum.map(_.getAs[Long]("n_unexamined")).sum == 4936L,
      "over-cap rows must be flagged, not silently examined or dropped")
    assert(graft.vector.SemDedup.soundViolations(vecs, "vec_id",
      "embedding", k = 1, tau = 0.9, datasetKey = "semdedup-hotcell",
      maxCell = 64).count() == 0L)
  }

  test("null text and null embeddings are excluded, never grouped or crashed") {
    import spark.implicits._
    // exactDupGroups: md5(null) is null — 3 null-text docs must NOT
    // collapse into one "duplicate" group with 2 droppable members.
    val docs = Seq((1L, Some("same text")), (2L, Some("same text")),
      (3L, Option.empty[String]), (4L, Option.empty[String]),
      (5L, Option.empty[String])).toDF("doc_id", "text")
    val groups = graft.text.DedupJobs.exactDupGroups(docs, "doc_id", "text")
      .collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("n_docs") == 2L)
    // simhash: null text used to NPE inside the fused UDF.
    val sims = graft.text.DedupJobs.simhashNearDups(docs, "doc_id", "text")
      .collect()
    assert(sims.forall(r => r.getAs[Long]("id_a") <= 2L))
    val sigRow = docs.select(
      graft.text.TextFunctions.simhash64(col("text")).as("s"))
      .filter(col("s").isNull).count()
    assert(sigRow == 3L, "null text must yield a null signature")
    // vector paths: a null embedding row must be excluded, not NPE.
    val vecs = Seq((0L, Some(Array(1.0f, 0.0f, 0.0f, 0.0f))),
      (1L, Some(Array(1.0f, 0.0f, 0.0f, 0.0f))),
      (2L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    val (assigned, _) = graft.vector.IvfIndex.assign(
      vecs, "vec_id", "embedding", k = 1)
    assert(assigned.count() == 2L)
    assert(graft.vector.VectorOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.9).count() == 1L)
    assert(graft.vector.VectorOps.lshNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.9, dim = 4)
      .count() == 1L)
  }

  test("minhash rejects band configs that would silently hash zero rows") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.text.DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
        k = 4, bands = 8)
    }
    assert(e.getMessage.contains("bands must divide k"))
    intercept[IllegalArgumentException] {
      graft.text.DedupJobs.minhashCandidatePairs(docs, "doc_id", "text",
        k = 32, bands = 5)
    }
  }

  test("SemDeDup streams a 100k-vector hot cell in bounded time/memory") {
    // The at-scale rehearsal of the cap (VERDICT r8 #6): the 5k case
    // above pins the degrade SEMANTICS; this one proves the streaming
    // kernel's BOUND where it matters — 100k vectors forced into ONE
    // cell (k = 1) under maxCell = 256 must stream through the sorted
    // partition with kernel state capped at 256 kept vectors (~32 KB
    // at dim 16), i.e. finish promptly in this small test JVM instead
    // of materializing the cell like the pre-r8 toArray kernel, whose
    // memory would be 100k × dim with no cap. Vectors are built
    // plan-side (no 100k driver-side arrays).
    val n = 100000L
    val cap = 256
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), j -> " +
        "cast(pmod(id * 31 + j * 7, 1000) / 1000.0 + 0.5 as float))")
        .as("embedding"))
    val t0 = System.nanoTime()
    val sum = graft.vector.SemDedup.summary(vecs, "vec_id", "embedding",
        k = 1, tau = 0.95, datasetKey = "semdedup-100k", maxCell = cap)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(sum.map(_.getAs[Long]("n_vecs")).sum == n)
    assert(sum.map(_.getAs[Long]("n_unexamined")).sum == n - cap,
      "exactly the first maxCell ids are examined")
    assert(sum.map(_.getAs[Long]("n_dropped")).sum <= cap,
      "only examined rows may drop")
    assert(sum.map(r => r.getAs[Long]("n_kept") +
      r.getAs[Long]("n_dropped")).sum == n)
    // Loose wall-clock sanity: the kernel is one shuffle + one sorted
    // stream; minutes would mean the cell was buffered, not streamed.
    assert(secs < 90.0, f"hot-cell stream took $secs%.1f s")
  }
}
