package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deduplication jobs for the training-data pipeline: exact,
  * MinHash+LSH near-dup, SimHash, and n-gram Jaccard. Each job is
  * shuffle-minimal and skew-guarded — the shapes that survive a 100 TB
  * corpus:
  *
  *  - exact: one hash-groupBy on the text digest (never the raw text —
  *    the shuffle carries 32-byte digests, not documents)
  *  - MinHash LSH: map-side shingle→signature, shuffle only
  *    (doc_id, band, bucket) triples, bucket-local pair generation with
  *    an explicit bucket-size cap against degenerate buckets
  *  - SimHash: map-side 64-bit signature, band-rotate bucketing
  *  - n-gram Jaccard: blocked pair join + exact verification
  */
object DedupJobs {

  import TextFunctions._
  import org.apache.spark.sql.functions.udf

  /** Tight-loop exact Jaccard for the pair-verification stage — same
    * value as size(∩)/size(∪) on distinct arrays, ~10× the Column
    * array_intersect/array_union path on large candidate sets.
    */
  private val jaccardUdf = udf { (a: Seq[String], b: Seq[String]) =>
    if (a.isEmpty && b.isEmpty) 0.0
    else {
      val sa = new java.util.HashSet[String](a.length * 2)
      a.foreach(sa.add)
      var inter = 0
      b.foreach(s => if (sa.contains(s)) inter += 1)
      inter.toDouble / (a.length + b.length - inter)
    }
  }

  /** Exact dedup by content digest: groups of identical texts, keeping
    * the smallest id as survivor.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** MinHash-LSH candidate pairs verified by exact shingle Jaccard.
    *
    * @param k          signature length (hash permutations)
    * @param bands      LSH bands (rows per band = k/bands); with k=32,
    *                   bands=8 → r=4, S-curve threshold ≈ (1/8)^(1/4) ≈ 0.59
    * @param shingleN   words per shingle
    * @param threshold  exact-Jaccard acceptance floor
    * @param maxBucket  skew guard: buckets larger than this are dropped
    *                   (a degenerate bucket of m docs generates m²/2
    *                   pairs — at corpus scale one hot bucket can
    *                   dominate the whole job)
    * @param withAudit  when set, each verified pair also carries
    *                   `jaccard_check`: the same exact Jaccard computed
    *                   by the INDEPENDENT codegen'd set path
    *                   (array_intersect/array_union) instead of the
    *                   tight-loop UDF — the soundness-audit surface
    *                   (violations of `jaccard_check ≥ threshold`
    *                   should not exist)
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 100,
      withAudit: Boolean = false): DataFrame = {

    // Fused tokens→shingles→signature→band-buckets kernel: shingle
    // strings and the k-length signature live only inside the UDF call
    // (never materialized as plan arrays — caching/carrying them was
    // the measured cost, not the hashing). Output: one bucket key per
    // band.
    val rows = k / bands
    val bandsUdf = udf { toks: Seq[String] =>
      val sig = Array.fill(k)(Long.MaxValue)
      if (toks.nonEmpty) {
        val arr = toks.toArray
        val upper = math.max(arr.length - shingleN, 0)
        var p = 0
        while (p <= upper) {
          val sb = new java.lang.StringBuilder()
          var q = p
          val end = math.min(p + shingleN, arr.length) - 1
          while (q <= end) {
            if (q > p) sb.append(' ')
            sb.append(arr(q))
            q += 1
          }
          val base = TextFunctions.hash64(sb.toString)
          var i = 0
          while (i < k) {
            val h = TextFunctions.mix64(base + i)
            if (h < sig(i)) sig(i) = h
            i += 1
          }
          p += 1
        }
      }
      Array.tabulate(bands) { b =>
        var h = 1125899906842597L
        var i = b * rows
        while (i < (b + 1) * rows) {
          h = TextFunctions.mix64(h ^ sig(i))
          i += 1
        }
        h
      }
    }
    val exploded = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), posexplode(bandsUdf(col("__toks"))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))

    // Buckets carry doc IDS ONLY — never the shingle arrays. A hot
    // bucket of m docs would otherwise materialize m²/2 pair structs
    // each copying two full shingle arrays inside a single row
    // (observed: content-correlated corpora drive buckets to the cap
    // and the explode allocates gigabytes in one task). Pairs of ids
    // are 16 bytes; shingles re-attach by join afterwards. maxBucket
    // skew-caps degenerate buckets — a band bucket hundreds deep is
    // content-collision noise, not near-duplication.
    val buckets = exploded
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))

    // persist + eager count: `pairs` feeds three consumers (both
    // candidateIds branches and the verification join), and the
    // candidateIds consumer is a BROADCAST subplan — its future races
    // the cache fill and, losing, recomputes the whole
    // shingle→signature→bucket search cold in a single task (measured:
    // 1.8 s of a 4 s query). Materializing before returning makes every
    // consumer a cache read; at corpus scale this boundary is a
    // checkpoint, locally MEMORY_AND_DISK is the same shape.
    val pairs = buckets
      .select(explode(expr(
        """filter(
          |  flatten(transform(members, a ->
          |    transform(members, b -> struct(a AS id_a, b AS id_b)))),
          |  p -> p.id_a < p.id_b)""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .persist()
    pairs.count()

    // Exact-Jaccard verification shingles are computed ONLY for docs
    // that appear in candidate pairs (semi-join pushback) — the corpus
    // at large never materializes its shingle arrays.
    val candidateIds = pairs.select(col("id_a").as("cid"))
      .unionByName(pairs.select(col("id_b").as("cid")))
      .distinct()
    val shOf = docs
      .select(col(idCol).as("cid"), tokens(col(textCol)).as("__toks"))
      .join(candidateIds, Seq("cid"), "left_semi")
      .select(col("cid"), shinglesOf(col("__toks"), shingleN).as("sh"))
    val verified = pairs
      .join(shOf.withColumnRenamed("cid", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(shOf.withColumnRenamed("cid", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard_raw", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_raw") >= threshold)
    // Direct ratio, not TextFunctions.jaccard: its zero-union guard
    // (`when(union > 0, …)`) evaluates array_union twice per row, and
    // verified pairs always have non-empty shingle sets.
    val audit =
      if (withAudit)
        Seq(round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard_check"))
      else Nil
    verified.select(col("id_a") +: col("id_b") +:
      round(col("jaccard_raw"), 4).as("jaccard") +: audit: _*)
  }

  /** Near-dup groups: every doc mapped to the smallest verified
    * neighbor id (one min-neighbor pass — cheap transitive-lite
    * grouping; full connected components would iterate this join to a
    * fixpoint, unnecessary for reporting survivors).
    */
  def minhashDupGroups(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashCandidatePairs(docs, idCol, textCol, k, bands, shingleN, threshold)
    val neighbors = pairs.select(col("id_a").as("doc_id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("doc_id"), col("id_a").as("nb")))
      .groupBy("doc_id").agg(min("nb").as("min_nb"), count(lit(1)).as("n_candidates"))
    docs.select(col(idCol).as("doc_id"))
      .join(neighbors, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("min_nb"), col("doc_id"))).as("dup_group"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }

  /** SimHash signatures with near-dup bucket counts: docs whose 64-bit
    * simhash matches another doc within `maxHamming` bits, found via
    * 4×16-bit block bucketing (pigeonhole: ≤3 differing bits → at least
    * one identical 16-bit block).
    */
  /** @param maxBucket skew guard, same pattern as
    *        [[minhashCandidatePairs]]: a hot 16-bit block key of m docs
    *        would otherwise generate m²/2 pairs inside one join task
    *        (the 16-bit keyspace has only 65k values per block — at
    *        corpus scale EVERY bucket is hot). Buckets beyond the cap
    *        are dropped as content-collision noise.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), simhash64Of(col("__toks")).as("simhash"))
    // Pigeonhole bucketing: ≤3 differing bits of 64 → at least one of
    // the 4 16-bit blocks identical. Buckets carry (id, simhash)
    // members only; pairs are generated bucket-locally under the cap.
    val blocks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"),
          shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFF).as("key"))): _*)).as("b"))
    val buckets = blocks
      .groupBy(col("b.blk").as("blk"), col("b.key").as("key"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """filter(
          |  flatten(transform(members, a ->
          |    transform(members, b -> struct(a AS x, b AS y)))),
          |  p -> p.x.doc_id < p.y.doc_id)""".stripMargin)).as("p"))
      .select(col("p.x.doc_id").as("id_a"), col("p.y.doc_id").as("id_b"),
        hamming64(col("p.x.simhash"), col("p.y.simhash")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact blocked n-gram Jaccard pairs. Output equals the naive
    * all-pairs SQL oracle; the search itself never materializes gram
    * strings for the corpus at large: a fused kernel reduces each doc
    * to sorted 64-bit gram hashes, the broadcast pair loop applies two
    * exact prefilters (length bound j ≤ min/max; hash-merge
    * intersection, whose collisions only OVERcount — a candidate
    * superset, never a miss), and gram strings are computed solely for
    * candidate docs at the final exact-verification join.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, threshold: Double,
      broadcastBlockSize: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // Fused tokens→gram-hash kernel: only (id, block, sorted 64-bit
    // gram hashes) flow through the plan — gram STRINGS are computed
    // solely for candidate pairs at the exact-verification step.
    val hashGramsUdf = udf { toks: Seq[String] =>
      val arr = toks.toArray
      val upper = math.max(arr.length - n, 0)
      val set = new java.util.TreeSet[java.lang.Long]()
      var p = 0
      while (p <= upper) {
        val sb = new java.lang.StringBuilder()
        var q = p
        val end = math.min(p + n, arr.length) - 1
        while (q <= end) {
          if (q > p) sb.append(' ')
          sb.append(arr(q))
          q += 1
        }
        set.add(TextFunctions.hash64(sb.toString))
        p += 1
      }
      val out = Array.ofDim[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    val prepped = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col(idCol).cast("long").as("doc_id"),
        concat_ws("\u0001", blockCols.map(col): _*).as("blk"),
        tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), col("blk"), hashGramsUdf(col("__toks")).as("gh"))

    // Candidate search over the broadcast hash arrays with two exact
    // prefilters (the deliberate imperative kernel for the O(n²)
    // baseline, same rationale as cosineNearDupPairs):
    //  1. length bound: j ≤ min/max of distinct-gram counts
    //  2. sorted-hash merge-intersection — collisions can only MERGE
    //     distinct grams (overcount), so this admits a candidate
    //     superset and never drops a true pair
    // At corpus scale the broadcast side is blocked, or MinHash-LSH
    // (minhashCandidatePairs) replaces 1–2 as the prefilter.
    def mergeIntersect(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }
    // Blocks stream through the driver via toLocalIterator — the full
    // corpus never sits in driver heap; each block goes straight to the
    // (disk-backed) broadcast manager. Corpora beyond executor memory
    // stream block by block; per-block candidate sets union.
    import scala.jdk.CollectionConverters._
    val localBlocks = prepped.toLocalIterator().asScala.map { r =>
      (r.getLong(0), r.getString(1), r.getSeq[Long](2).toArray)
    }.grouped(broadcastBlockSize)

    val candidates = localBlocks.map { blockSeq =>
      val bc = spark.sparkContext.broadcast(blockSeq.toArray)
      prepped
        .flatMap { r =>
          val idA = r.getLong(0)
          val blkA = r.getString(1)
          val hashA = r.getSeq[Long](2).toArray
          val la = hashA.length
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val all = bc.value
          var j = 0
          while (j < all.length) {
            val (idB, blkB, hashB) = all(j)
            val lb = hashB.length
            if (idB > idA && blkB == blkA &&
              math.min(la, lb) >= threshold * math.max(la, lb)) {
              val hInter = mergeIntersect(hashA, hashB)
              if (hInter.toDouble / (la + lb - hInter) >= threshold)
                out += ((idA, idB))
            }
            j += 1
          }
          out
        }
        .toDF("id_a", "id_b")
    }.toSeq
    val candidatesAll = (candidates :+ Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .reduce(_ unionByName _)

    // exact string-set verification, shingles computed only for docs in
    // candidate pairs
    val candidateIds = candidatesAll.select(col("id_a").as("cid"))
      .unionByName(candidatesAll.select(col("id_b").as("cid")))
      .distinct()
    val shOf = docs
      .select(col(idCol).cast("long").as("cid"),
        tokens(col(textCol)).as("__toks"))
      .join(candidateIds, Seq("cid"), "left_semi")
      .select(col("cid"), shinglesOf(col("__toks"), n).as("sh"))
    candidatesAll
      .join(shOf.withColumnRenamed("cid", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(shOf.withColumnRenamed("cid", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard_raw", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard_raw"), 4).as("jaccard"))
  }
}
