package graft.text

import graft.SessionCache
import org.apache.spark.sql.{Column, DataFrame}
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
  *  - SimHash: map-side 64-bit signature, block-combination bucketing
  *    with an exact pigeonhole recall guarantee
  *  - n-gram Jaccard: exact distributed set-similarity join via prefix
  *    filtering (no all-pairs, no driver funnel)
  *
  * The expensive searches (MinHash, n-gram) are built once per
  * (session, input, parameters) through [[graft.SessionCache]]: the
  * verified-pairs frame is persisted and shared by every consumer
  * (the dedup query, its soundness audit, the group mapping), and the
  * cache evicts with the owning session.
  */
object DedupJobs {

  import TextFunctions._
  import org.apache.spark.sql.functions.udf

  /** Tight-loop exact Jaccard for the pair-verification stage — same
    * value as size(∩)/size(∪) on distinct arrays, ~10× the Column
    * array_intersect/array_union path on large candidate sets.
    */
  private[text] val jaccardUdf = udf { (a: Seq[String], b: Seq[String]) =>
    if (a.isEmpty && b.isEmpty) 0.0
    else {
      val sa = new java.util.HashSet[String](a.length * 2)
      a.foreach(sa.add)
      var inter = 0
      b.foreach(s => if (sa.contains(s)) inter += 1)
      inter.toDouble / (a.length + b.length - inter)
    }
  }

  /** Spread a parallelism-starved scan before a per-doc kernel. A
    * cluster-scale corpus arrives already split across many files/row
    * groups -- repartitioning it would shuffle every corpus byte for
    * nothing, so such scans pass through untouched. A single-row-group
    * local file, though, would run the whole kernel in ONE task; that
    * scan is spread to defaultParallelism/4 partitions -- enough to
    * saturate cores on the map-side kernel while keeping tasks large
    * enough to amortize per-task overhead (32 near-empty tasks measured
    * slower than 8 right-sized ones on the local corpus).
    */
  private def spread(docs: DataFrame): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val target = math.max(sc.defaultParallelism / 4, 1)
    // pass through anything already AT or ABOVE the target — the old
    // `*2 >= defaultParallelism` guard shuffled a dp/4..dp/2-partition
    // input DOWN below its own parallelism
    if (docs.rdd.getNumPartitions >= target) docs
    else docs.repartition(target)
  }

  /** Exact dedup by content digest: groups of identical texts, keeping
    * the smallest id as survivor. Null-text docs are EXCLUDED: their
    * content is unknown, not identical — md5(null) is null and the
    * groupBy would otherwise collapse every null-text doc into one
    * "duplicate" group whose non-survivors a consumer would drop.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** MinHash-LSH candidate pairs verified by exact shingle Jaccard.
    *
    * Built once per (session, input, parameters) and session-cached:
    * one eager job materializes the (band, bucket) index — tokenizing
    * the corpus exactly once, reused for both the signature and the
    * verification-shingle stages — then the verified pairs (small:
    * near-dup ids + scores) persist for every consumer. The audit
    * column is always computed during the build (it costs one codegen'd
    * set expression on the few verified pairs) so the dedup query and
    * its soundness audit share one search.
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
    * @param cacheKey   stable identity of `docs` for the session cache;
    *                   defaults to the analyzed plan's 128-bit digest
    *                   ([[graft.PlanKey]])
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 100,
      withAudit: Boolean = false,
      cacheKey: Option[String] = None): DataFrame = {
    // bands must divide k: rows-per-band = k/bands drives the
    // (1/b)^(1/r) S-curve. bands > k would hash ZERO rows per band
    // (every doc in one constant bucket per band → the cap drops them
    // all → silent empty result), and k % bands != 0 would silently
    // ignore the signature tail, changing the operating threshold.
    require(bands >= 1 && k >= bands && k % bands == 0,
      s"bands must divide k (k=$k, bands=$bands)")
    val ident = cacheKey.getOrElse(
      "sem=" + graft.PlanKey.of(docs))
    val key = s"minhash|$ident|$idCol|$textCol|k=$k|b=$bands|n=$shingleN|t=$threshold|mb=$maxBucket"
    val verified = SessionCache.getOrBuild(docs.sparkSession, key) {
      buildMinhashPairs(docs, idCol, textCol, k, bands, shingleN, threshold, maxBucket)
    }
    if (withAudit) verified
    else verified.select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Fused tokens→shingles→signature→band-buckets kernel: shingle
    * strings and the k-length signature live only inside the UDF call
    * (never materialized as plan arrays — caching/carrying them was
    * the measured cost, not the hashing). Output: one bucket key per
    * band. Shared by the in-session pair search and the persisted
    * digest store ([[DedupStore]]) so stored band buckets are
    * bit-identical to recomputed ones — one definition, no drift.
    */
  private[text] def bandBucketsUdf(k: Int, bands: Int, shingleN: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val rows = k / bands
    udf { toks: Seq[String] =>
      val sig = Array.fill(k)(Long.MaxValue)
      if (toks.nonEmpty) {
        // Each token hashed ONCE; a shingle's base hash is the mix64
        // chain over its token hashes (position-sensitive). This
        // avoids building and re-hashing a shingle string per position
        // (O(shingle bytes) allocation+hash work per gram) for the
        // same LSH quality -- strings exist only in the exact
        // verification stage.
        val arr = toks.toArray
        val th = Array.ofDim[Long](arr.length)
        var t = 0
        while (t < arr.length) { th(t) = TextFunctions.hash64(arr(t)); t += 1 }
        val upper = math.max(arr.length - shingleN, 0)
        var p = 0
        while (p <= upper) {
          var base = 1125899906842597L
          var q = p
          val end = math.min(p + shingleN, arr.length) - 1
          while (q <= end) {
            base = TextFunctions.mix64(base ^ th(q))
            q += 1
          }
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
  }

  private def buildMinhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, shingleN: Int,
      threshold: Double, maxBucket: Int): (DataFrame, Seq[DataFrame]) = {

    val bandsUdf = bandBucketsUdf(k, bands, shingleN)

    // The corpus is tokenized exactly ONCE into this cached frame,
    // feeding both the signature stage and the verification-shingle
    // stage (round 2 tokenized twice — a full extra corpus pass); the
    // cache fills under the single eager buckets job below.
    val toks = spread(docs)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .persist()

    // posexplode_OUTER + isNotNull, not posexplode: the inner form
    // triggers InferFiltersFromGenerate, which duplicates the generator
    // argument — the FULL minhash signature kernel — into a
    // Filter(size(bandsUdf(..)) > 0) below the Generate, doubling the
    // most expensive stage of the search. bandsUdf always returns
    // `bands` buckets, so the outer form emits no null rows to drop.
    val exploded = toks
      .select(col("doc_id"), posexplode_outer(bandsUdf(col("__toks"))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
      .filter(col("bucket").isNotNull)

    // Buckets carry doc IDS ONLY — never the shingle arrays. A hot
    // bucket of m docs would otherwise materialize m²/2 pair structs
    // each copying two full shingle arrays inside a single row
    // (observed: content-correlated corpora drive buckets to the cap
    // and the explode allocates gigabytes in one task). Pairs of ids
    // are 16 bytes; shingles re-attach by join afterwards. maxBucket
    // skew-caps degenerate buckets — a band bucket hundreds deep is
    // content-collision noise, not near-duplication.
    //
    // Deliberately NOT persisted: `pairs` and `candidateIds` below both
    // read it through the SAME shuffle exchange, which ReuseExchange
    // dedups into one map stage — the scheduler-level guarantee that
    // the expensive search runs once per job. (Round 2 instead put an
    // eager persist+count barrier after pair generation; it serialized
    // the search into its own job chain and still double-tokenized —
    // the 4× local regression.)
    val buckets = exploded
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .persist()

    // outer + isNotNull so the O(m²) pair enumeration isn't duplicated
    // into an inferred size()>0 pre-filter (InferFiltersFromGenerate).
    val pairs = buckets
      .select(explode_outer(
        BucketPairs.fullPairs("members", "p.x < p.y")).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.x").as("id_a"), col("p.y").as("id_b"))

    // Exact-Jaccard verification shingles are computed ONLY for docs
    // that appear in some surviving bucket (semi-join pushback) — the
    // corpus at large never materializes its shingle arrays. No
    // distinct on the candidate ids: a semi join dedups by itself.
    val candidateIds = buckets
      .select(explode(col("members")).as("cid"))
    val shOf = toks
      .withColumnRenamed("doc_id", "cid")
      .join(candidateIds, Seq("cid"), "left_semi")
      .select(col("cid"), shinglesOf(col("__toks"), shingleN).as("sh"))

    // Direct ratio, not TextFunctions.jaccard: its zero-union guard
    // (`when(union > 0, …)`) evaluates array_union twice per row, and
    // verified pairs always have non-empty shingle sets. The
    // cross-band pair dedup runs LAST, on the few verified rows,
    // instead of shuffling the full candidate set up front.
    val verified = pairs
      .join(shOf.withColumnRenamed("cid", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(shOf.withColumnRenamed("cid", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard_raw", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard_raw"), 4).as("jaccard"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard_check"))
      .dropDuplicates("id_a", "id_b")
      .persist()
    // ONE eager job: everything above — tokenize, signature, buckets,
    // pair generation, verification — lands in this count; consumers
    // read the small verified frame from cache. `toks` and `buckets`
    // persist LAZILY under this same action (no separate barrier jobs:
    // each barrier cost its own AQE job chain, ~0.3 s of 30–90 ms
    // scheduling slices at local scale). Concurrent branches hitting an
    // unfilled cached partition serialize on the block manager's write
    // lock — one computes, the rest read — so the search still runs
    // once.
    verified.count()
    toks.unpersist()
    buckets.unpersist()
    (verified, Seq(verified))
  }

  /** Near-dup groups: every doc mapped to its TRANSITIVE dup group
    * (smallest id reachable through verified pairs, via
    * [[connectedComponents]] — a~b, b~c land in one group even when
    * a~c itself misses the threshold), plus the doc's verified-neighbor
    * degree. Docs with no verified neighbor are their own group.
    */
  def minhashDupGroups(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5,
      cacheKey: Option[String] = None): DataFrame = {
    val pairs = minhashCandidatePairs(docs, idCol, textCol, k, bands,
      shingleN, threshold, cacheKey = cacheKey)
    val degree = pairs.select(col("id_a").as("doc_id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("doc_id"), col("id_a").as("nb")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    val comps = connectedComponents(pairs)
      .withColumnRenamed("component", "comp")
    docs.select(col(idCol).as("doc_id"))
      .join(degree, Seq("doc_id"), "left")
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("dup_group"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }

  /** Connected components over a near-dup pair graph — true transitive
    * dup groups (a~b, b~c ⇒ {a,b,c} share one group), upgrading the
    * one-pass min-neighbor mapping of [[minhashDupGroups]] which only
    * links immediate neighbors. Min-label propagation: every node
    * starts as its own component and repeatedly takes the minimum
    * label over itself and its neighbors until a fixpoint — converges
    * in O(graph diameter) joins, each a key-partitioned shuffle with
    * an early-exit change count. Near-dup graphs are overwhelmingly
    * tiny cliques/short paths (diameter 2–4), so the loop is short;
    * a corpus with adversarially long chains would want the
    * large-star/small-star contraction (Kiveris et al., SOCC'14) that
    * halves diameter per round — noted here as the upgrade path, not
    * needed for dedup-shaped graphs.
    *
    * @param pairs undirected edges as (id_a, id_b) columns
    * @param driverEdgeLimit edge count up to which a driver-side
    *        union-find replaces the join loop (see in-code rationale)
    * @return (doc_id, component) for every endpoint; component =
    *         smallest reachable id
    */
  /** Driver-side union-find with union-by-MIN-label and path
    * compression — every root is its component's minimum id, the
    * same fixpoint as the distributed min-label loop. ONE definition
    * shared by [[connectedComponents]]' hybrid driver path and
    * [[ComponentStore]]'s append fold, so the maintained store and
    * the from-scratch components cannot diverge on the merge rule.
    */
  private[text] final class MinUnionFind {
    private val parent = scala.collection.mutable.LongMap.empty[Long]
    def contains(x: Long): Boolean = parent.contains(x)
    def nodes: Seq[Long] = parent.keys.toSeq
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
  }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      driverEdgeLimit: Long = 2000000L): DataFrame = {
    // Hybrid execution: the edge set of a near-dup graph is orders of
    // magnitude smaller than the corpus (it's the OUTPUT of dedup
    // detection, not the input), so up to `driverEdgeLimit` edges
    // (~32 MB of long pairs) union-find on the driver beats the
    // iterative join loop by the loop's whole fixed cost — each
    // distributed round is a join + groupBy + checkpoint regardless of
    // size, seconds of scheduling for kilobytes of edges. This is the
    // standard production split; the distributed min-label loop below
    // remains the unbounded-scale path and the two agree exactly
    // (DedupSpec drives both).
    // ONE bounded fetch decides the path AND supplies the edges: a
    // count()-then-collect() pair would execute the upstream search
    // plan twice for callers that pass an unpersisted frame. limit+1
    // rows distinguish "fits" from "overflows" without a full count.
    val lim = math.min(driverEdgeLimit, Int.MaxValue - 1L).toInt
    val fetched = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .limit(lim + 1)
      .collect()
    if (fetched.length <= lim) {
      val spark = pairs.sparkSession
      val uf = new MinUnionFind
      fetched.foreach(r => uf.union(r.getLong(0), r.getLong(1)))
      import spark.implicits._
      return uf.nodes.map(id => (id, uf.find(id)))
        .toDF("doc_id", "component")
    }
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    // One self-loop per node folds the node's OWN label into the same
    // min-aggregation that merges neighbor labels: each round is ONE
    // join + ONE groupBy (the least()/left-join reconciliation step of
    // the textbook formulation disappears), and the self-loop row
    // doubles as the carrier of the previous label for the convergence
    // count — no extra old-vs-new join.
    val withSelf = sym.unionByName(
      sym.select(col("src"), col("src").as("dst")).distinct()).persist()
    // Round 0 needs no label join at all: every label starts as its own
    // id, so the propagated min is just min(dst) over self-looped edges.
    var labels = graft.Checkpoint.pin(
      withSelf.groupBy("src").agg(min("dst").as("comp"))
        .withColumnRenamed("src", "id"))
    // Iterations materialize through eager Checkpoint.pin: lineage is
    // TRUNCATED each round (a persist chain would re-plan the whole
    // history every iteration and need manual release bookkeeping;
    // pinned iterations are reclaimed by the ContextCleaner when they
    // fall out of scope). The default local pin trades executor-loss
    // resilience for speed — a cluster run on preemptible capacity
    // sets `graft.checkpoint.reliable=true` so each round's labels
    // land in the replicated checkpoint dir and an executor loss
    // costs a re-read, not the job; dedup graphs converge in 2–4
    // rounds.
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val stepped = graft.Checkpoint.pin(withSelf
        .join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .groupBy("src").agg(
          min("comp").as("comp"),
          // exactly one self-loop per node → its comp IS the old label
          max(when(col("src") === col("dst"), col("comp"))).as("old")))
      changed = stepped.filter(col("comp") =!= col("old")).count()
      labels = stepped.select(col("src").as("id"), col("comp"))
      i += 1
    }
    withSelf.unpersist()
    // A silent non-converged return would hand back stale non-minimal
    // labels as if correct; graphs with diameter > maxIter (adversarial
    // chains) must fail loudly so the caller raises maxIter or switches
    // to star-contraction.
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing); raise maxIter")
    labels.select(col("id").as("doc_id"), col("comp").as("component"))
  }

  /** SimHash near-dup pairs via block-combination bucketing with an
    * EXACT pigeonhole recall guarantee: the 64-bit signature splits
    * into `blocks` equal blocks; each doc is keyed by every
    * C(blocks, comboSize) concatenation of `comboSize` block values. A
    * pair differing in h bits dirties at most h blocks, so for
    * h ≤ blocks − comboSize at least `comboSize` blocks are clean and
    * the pair shares the bucket keyed by those blocks — recall is exact
    * up to `blocks − comboSize` bits (Manku et al. WWW'07 block-permute
    * family). Defaults (4, 1) guarantee ≤ 3 bits with 16-bit keys;
    * (8, 2) guarantees ≤ 6 bits with 16-bit keys at 28 probes/doc.
    * `maxHamming` above the guarantee bound still returns pairs but
    * with partial recall.
    *
    * @param maxBucket skew guard, same rationale as
    *        [[minhashCandidatePairs]]: a hot block key of m docs would
    *        otherwise generate m²/2 pairs inside one task. Buckets over
    *        the cap emit STAR pairs around their smallest-id member
    *        (linear cost) instead of being dropped — duplicate-dense
    *        content (the exact case a deduper exists for) stays
    *        connected through the hub doc, at the price of missing
    *        hub-less pairs inside hot buckets. Within the cap the
    *        pigeonhole guarantee is exact.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000,
      blocks: Int = 4, comboSize: Int = 1): DataFrame =
    simhashNearDupsOf(
      docs
        // null text has no signature (the fused UDF would NPE on the
        // null token array — the minhash path filters the same way)
        .filter(col(textCol).isNotNull)
        .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
        .select(col("doc_id"), simhash64Of(col("__toks")).as("simhash")),
      maxHamming, maxBucket, blocks, comboSize)

  /** Same search over a PRECOMPUTED (doc_id, simhash) frame — callers
    * that also emit the signatures (the dedup query does) persist that
    * frame once and pass it here, instead of paying the corpus
    * tokenize+signature pass twice.
    */
  def simhashNearDupsOf(sigs0: DataFrame,
      maxHamming: Int, maxBucket: Int,
      blocks: Int, comboSize: Int): DataFrame = {
    require(64 % blocks == 0, s"blocks must divide 64, got $blocks")
    // a precomputed frame may carry null signatures (null-text docs);
    // they have no content to compare
    val sigs = sigs0.filter(col("simhash").isNotNull)
    require(comboSize >= 1 && comboSize < blocks,
      s"comboSize must be in [1, blocks), got $comboSize")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val combos = (0 until blocks).combinations(comboSize).toSeq

    def blockVal(b: Int): Column =
      shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))
    val keyStructs = combos.zipWithIndex.map { case (combo, ci) =>
      val keyCol = combo.foldLeft(lit(0L): Column)((acc, b) =>
        shiftleft(acc, width).bitwiseOR(blockVal(b)))
      struct(lit(ci).as("blk"), keyCol.as("key"))
    }
    val keyed = sigs.select(col("doc_id"), col("simhash"),
      explode(array(keyStructs: _*)).as("b"))
    val buckets = keyed
      .groupBy(col("b.blk").as("blk"), col("b.key").as("key"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")) >= 2)

    // Under the cap: all in-bucket pairs. Over: star pairs around the
    // smallest-id member — linear in bucket size, keeps hot buckets
    // represented (see maxBucket scaladoc). Shared exprs: BucketPairs.
    // `members` sorted once into a fresh column; hub = first element.
    val fullPairs = BucketPairs.fullPairs("members", "p.x.doc_id < p.y.doc_id")
    val starPairs = BucketPairs.starPairs("sorted")
    // The hamming filter runs BEFORE the cross-band pair dedup: most
    // candidate pairs fail it (bucket keys collide on 16 shared bits,
    // not 61+), so filtering first shrinks the dropDuplicates exchange
    // from all-candidates to verified-pairs. Equivalent result — the
    // hamming distance is a pure function of the pair, so every
    // duplicate of a surviving pair survives identically.
    buckets
      .withColumn("sorted", array_sort(col("members")))
      // outer + isNotNull: keeps InferFiltersFromGenerate from cloning
      // the pair-enumeration expression into a pre-filter.
      .select(explode_outer(when(size(col("members")) <= lit(maxBucket), fullPairs)
        .otherwise(starPairs)).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.x.doc_id").as("id_a"), col("p.y.doc_id").as("id_b"),
        hamming64(col("p.x.simhash"), col("p.y.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact blocked n-gram Jaccard pairs, distributed end to end. Output
    * equals the naive all-pairs SQL oracle; the search is the standard
    * prefix-filtered set-similarity self-join (Bayardo et al. WWW'07;
    * Vernica et al. SIGMOD'10 for the MapReduce shape):
    *
    *  1. a fused kernel reduces each doc to its sorted distinct 64-bit
    *     gram hashes (gram STRINGS never flow through the search)
    *  2. prefix filter: under a global rare-first gram order, any pair
    *     with J ≥ τ shares a gram inside both docs' first
    *     (len − ⌈τ·len⌉ + 1) grams — proof: a pair with J ≥ τ has
    *     |A∩B| ≥ ⌈τ·|A|⌉, so A's prefix contains a common gram; the
    *     smallest common gram then sits inside BOTH prefixes. The
    *     inverted-index self-join on (block, prefix gram) therefore
    *     finds every qualifying pair — exact, no all-pairs product,
    *     nothing through the driver (the round-2 design streamed every
    *     corpus byte through a driver-side broadcast loop)
    *  3. per-pair exact prefilters: length bound (j ≤ min/max) in the
    *     join condition, then a sorted-hash merge-intersection. A
    *     collision between grams UNIQUE to each side only overcounts
    *     (candidate superset); the one theoretical miss is a collision
    *     between two grams SHARED by the pair, which shrinks ∩ and ∪
    *     together and can push the hash-Jaccard below τ — per-gram-pair
    *     probability 2⁻⁶⁴, unobservable in practice but stated here so
    *     the exactness claim is honest: exact up to 64-bit hash
    *     collisions
    *  4. gram-string verification only for surviving candidates
    *
    * The rare-first order demotes the `commonGramCap` globally most
    * frequent grams (one cheap agg, broadcast as a hash set) to the end
    * of every doc's order, keeping stop-gram inverted lists out of the
    * prefixes — the frequency ordering that makes prefix filtering
    * effective at corpus scale.
    *
    * Built once per (session, input, parameters) via
    * [[graft.SessionCache]]; the verified pairs persist for the session.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, threshold: Double,
      commonGramCap: Int = 1024,
      cacheKey: Option[String] = None): DataFrame = {
    val ident = cacheKey.getOrElse(
      "sem=" + graft.PlanKey.of(docs))
    val key = s"ngram|$ident|$idCol|$textCol|n=$n|t=$threshold|" +
      s"blk=${blockCols.mkString(",")}|cap=$commonGramCap"
    SessionCache.getOrBuild(docs.sparkSession, key) {
      buildNgramPairs(docs, idCol, textCol, blockCols, n, threshold, commonGramCap)
    }
  }

  private def buildNgramPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, threshold: Double,
      commonGramCap: Int): (DataFrame, Seq[DataFrame]) = {
    val spark = docs.sparkSession

    // Fused tokens→gram-hash kernel: only (id, block, sorted 64-bit
    // gram hashes) flow through the search.
    val hashGramsUdf = udf { toks: Seq[String] =>
      // Token hashes computed once; gram hash = position-sensitive
      // mix64 chain (no gram strings in the search -- see bandsUdf).
      // Collisions only MERGE distinct grams, and every consumer of
      // these hashes treats intersection counts as an upper bound.
      val arr = toks.toArray
      val th = Array.ofDim[Long](arr.length)
      var t = 0
      while (t < arr.length) { th(t) = TextFunctions.hash64(arr(t)); t += 1 }
      val upper = math.max(arr.length - n, 0)
      val set = new java.util.TreeSet[java.lang.Long]()
      var p = 0
      while (p <= upper) {
        var h = 1125899906842597L
        var q = p
        val end = math.min(p + n, arr.length) - 1
        while (q <= end) {
          h = TextFunctions.mix64(h ^ th(q))
          q += 1
        }
        set.add(h)
        p += 1
      }
      val out = Array.ofDim[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    // The cached prep frame carries BOTH the gram hashes (candidate
    // search) and the token arrays (exact verification) -- one
    // tokenization pass, no later re-read of the corpus.
    val prepped = spread(docs)
      .select(
        col(idCol).cast("long").as("doc_id"),
        concat_ws("\u0001", blockCols.map(col): _*).as("blk"),
        tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), col("blk"), col("__toks"),
        hashGramsUdf(col("__toks")).as("gh"))
      .persist()

    // Global rare-first gram order = (is-common, hash): the top
    // commonGramCap grams by document frequency sort last. Any total
    // order preserves prefix-filter correctness; this one keeps hot
    // inverted lists out of prefixes. This aggregation doubles as the
    // eager job that fills the prep cache.
    val common =
      if (commonGramCap <= 0) { prepped.count(); Set.empty[Long] }
      else prepped.select(explode(col("gh")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("g"))
        .limit(commonGramCap)
        .collect().map(_.getLong(0)).toSet
    val bcCommon = spark.sparkContext.broadcast(common)
    val prefixUdf = udf { gh: Seq[Long] =>
      val len = gh.length
      val p = math.min(len, len - math.ceil(threshold * len).toInt + 1)
      val cs = bcCommon.value
      val (rare, freq) = gh.partition(g => !cs.contains(g)) // gh sorted; partition is stable
      (rare ++ freq).take(p).toArray
    }
    // outer + isNotNull: avoids evaluating prefixUdf twice per row via
    // the inferred size()>0 filter (InferFiltersFromGenerate).
    val inv = prepped.select(col("doc_id"), col("blk"),
      size(col("gh")).as("len"), explode_outer(prefixUdf(col("gh"))).as("g"))
      .filter(col("g").isNotNull)

    // Inverted-index self-join on (block, prefix gram) with the exact
    // length bound in the join condition.
    val cand = inv.alias("a").join(inv.alias("b"),
        col("a.blk") === col("b.blk") && col("a.g") === col("b.g") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.len"), col("b.len")).cast("double") >=
          lit(threshold) * greatest(col("a.len"), col("b.len")))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Hash merge-intersection prefilter (overcount-only superset).
    val hashJaccardUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
      val aa = a.toArray
      val bb = b.toArray
      var i = 0; var j = 0; var c = 0
      while (i < aa.length && j < bb.length) {
        if (aa(i) == bb(j)) { c += 1; i += 1; j += 1 }
        else if (aa(i) < bb(j)) i += 1
        else j += 1
      }
      c.toDouble / (aa.length + bb.length - c)
    }
    // One join per side attaches gram hashes AND tokens from the prep
    // cache; the hash merge-intersection prefilter rejects false
    // candidates BEFORE any gram string exists, and shingles are
    // projected only for the filter's survivors (the projection sits
    // after the filter, so Catalyst computes them post-reject). No
    // driver round-trip, no extra semi-join chain -- the flattest
    // exact plan.
    val verified = cand
      .join(prepped.select(col("doc_id").as("id_a"),
        col("gh").as("gh_a"), col("__toks").as("tk_a")), Seq("id_a"))
      .join(prepped.select(col("doc_id").as("id_b"),
        col("gh").as("gh_b"), col("__toks").as("tk_b")), Seq("id_b"))
      .filter(hashJaccardUdf(col("gh_a"), col("gh_b")) >= threshold)
      .select(col("id_a"), col("id_b"),
        shinglesOf(col("tk_a"), n).as("sh_a"),
        shinglesOf(col("tk_b"), n).as("sh_b"))
      .withColumn("jaccard_raw", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard_raw"), 4).as("jaccard"))
      .persist()
    verified.count()
    prepped.unpersist()
    (verified, Seq(verified))
  }

  /** Sorted-neighborhood fuzzy dedup (Hernández & Stolfo '95, the
    * classic entity-resolution merge/purge method): sort the corpus by
    * a clustering key — here the `hdrLen`-char lowercased header — and
    * compare each record only against the `w` records that FOLLOW it
    * in sort order, flagging pairs whose header edit distance is ≤
    * `tau`. The semantics are exactly "pairs within `w` positions of
    * the global (header, id) order", so the result is deterministic
    * and oracle-checkable even though it is (by design) a
    * partial-recall heuristic — near-dups whose headers sort far apart
    * are out of contract, as in the original method.
    *
    * Scale shape: the global row number comes from
    * [[graft.Ranking.twoLevelRank]] bucketed by the 2-char header
    * prefix (the high-cardinality-key coarsening — histogram ≤
    * |alphabet|², regardless of corpus size); the
    * windowed self-join is an equi-join on `floor(rn/w)` with each
    * left row exploded into its own and the next block (the
    * q_range_join_bucketed trick), so no position-range theta-join or
    * cartesian ever plans. Edit distance runs on the `n·w` surviving
    * pairs only, never n². The ranked frame is pinned
    * ([[graft.Checkpoint.pin]] — local by default, reliable under
    * `graft.checkpoint.reliable=true`) so the ranking subtree (a
    * window plus a broadcast histogram join over the whole input)
    * executes ONCE across the self-join's two sides —
    * Catalyst only reuses bit-identical exchanges, and the per-side
    * aliases differ, so without the checkpoint the subtree runs twice.
    *
    * Null headers (null text) are dropped before ranking: a null
    * header can never produce a pair (`levenshtein(null, ·)` is null,
    * failing the `<= tau` filter), and dropping them keeps the rank
    * sequence — and therefore WHICH pairs fall inside a w-window —
    * independent of the engine's null placement (Spark sorts NULLS
    * FIRST ascending, ANSI row_number defaults elsewhere may not).
    */
  def sortedNeighborPairs(docs: DataFrame, idCol: String, textCol: String,
      hdrLen: Int = 32, w: Int = 10, tau: Int = 8): DataFrame = {
    val keyed = docs
      .select(col(idCol), substring(lower(col(textCol)), 1, hdrLen).as("hdr"))
      .filter(col("hdr").isNotNull)
      .withColumn("__bkt", substring(col("hdr"), 1, 2))
    val ranked = graft.Checkpoint.pin(graft.Ranking.twoLevelRank(keyed,
        partCols = Nil, bucketCol = "__bkt", bucketAsc = true,
        tieCols = Seq("hdr", idCol), out = "rn")
      .select(col(idCol), col("hdr"), col("rn")),
      eager = false)
    val lhs = ranked
      .select(col(idCol).as("id_a"), col("hdr").as("hdr_a"),
        col("rn").as("rn_a"),
        explode(array(floor(col("rn") / w),
          floor(col("rn") / w) + 1)).as("__blk"))
    val rhs = ranked
      .select(col(idCol).as("id_b"), col("hdr").as("hdr_b"),
        col("rn").as("rn_b"),
        floor(col("rn") / w).as("__blk"))
    // No dedup needed: each right row's block is unique, so a pair can
    // match through exactly one of the left row's two block copies.
    lhs.join(rhs, Seq("__blk"))
      .filter(col("rn_b") > col("rn_a") && col("rn_b") <= col("rn_a") + w)
      .filter(levenshtein(col("hdr_a"), col("hdr_b")) <= tau)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("hdr_a"), col("hdr_b")).as("dist"))
  }
}
