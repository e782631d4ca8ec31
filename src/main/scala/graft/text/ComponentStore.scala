package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vector.PersistedLayout

/** Maintained transitive dup-group store (round 12): connected
  * components over the MinHash-verified near-dup pair graph
  * ([[DedupJobs.minhashCandidatePairs]]'s criterion — band-bucket
  * candidates, exact-Jaccard verified), persisted and APPEND-
  * maintained so dup groups are available at ingest without ever
  * re-running the corpus pair search. The text-side closing of the
  * same gap the digest store closed for pair SCREENS: q_dedup_cc
  * recomputes its components from the full pair graph per run; this
  * store pays O(batch × candidates) per arriving batch.
  *
  * Layout (beside the other persisted stores, same marker protocol):
  *   - `members` (doc_id, orig_root): one row per doc that has ever
  *     appeared in a verified pair, stamped with its component root
  *     AT INSERT. Appends only add rows; later merges go through the
  *     remap — until the remap crosses [[remapFoldDefault]], when one
  *     distributed FOLD rewrites members with roots resolved and
  *     truncates the remap to empty (round-13: the remap otherwise
  *     grows with roots-ever-merged for the store's lifetime).
  *   - `remap` (old_root, new_root): the component merges, kept fully
  *     PATH-COMPRESSED at write time (new_root is final, never itself
  *     remapped) so resolution is ONE broadcast join, not an
  *     iteration. Tiny — one row per root merged away since the last
  *     fold — and rewritten whole per append.
  *   - `edges` (id_a, id_b): log of every verified pair the store has
  *     accepted; the `_sound` audit re-derives the components from it
  *     and must match [[resolve]] exactly. FOLDED to the spanning star
  *     of the resolved components (round-14) once it exceeds its
  *     compacted size by [[edgeFoldSlackDefault]] — bounded by
  *     members + slack + batch instead of growing for the store's
  *     lifetime.
  *   - `edges_witness` (id_a, id_b): BOUNDED pseudo-random reservoir
  *     of raw accepted pairs — the spanning star is derived from the
  *     store's own members, so audits over it alone are
  *     self-referential for pre-fold history; witness pairs give the
  *     `_sound` audit back a bounded independent check there (every
  *     witness pair must still resolve into one component). Sampled
  *     at ACCEPT time (round-16 advice) — seeded from the raw pair
  *     log at build, refreshed from each append's verified batch —
  *     never from the post-fold log: the round-15 fold-time sampling
  *     read the live log, which after the first fold contains derived
  *     star rows, so successive folds diluted the raw history with
  *     the store's own output and a mis-fold surviving one audit
  *     cycle got its wrong star edges adopted as ground truth.
  *   - `ids` (doc_id): the fingerprinted roster (all non-null-text
  *     docs, paired or not) — the append path's growth detector.
  *
  * Component ids are CANONICAL min-labels (the smallest doc id
  * reachable through verified pairs — [[DedupJobs.connectedComponents]]'
  * fixpoint), and stay canonical across appends: an old root is the
  * minimum of its component, so the merged root — the minimum over
  * merged old roots and new doc ids — is the minimum of the merged
  * component.
  *
  * Append semantics are MONOTONE (components only ever merge): an
  * arriving batch is screened against the up-to-date digest store —
  * delta-internal and delta-vs-corpus candidates in one pass, digests
  * only — then exact-verified by fetching ONLY the candidate ids'
  * text. Old-old pairs cannot newly appear (their buckets are
  * unchanged; any such pair was found when the newer doc was itself
  * the delta). One deliberate asymmetry vs a from-scratch build: the
  * full build applies [[DedupJobs.minhashCandidatePairs]]'s
  * `maxBucket` skew cap corpus-wide, while the batch screen's
  * candidates are bounded by the batch itself — a bucket pushed past
  * the cap by late arrivals keeps the edges it contributed while
  * under it. Monotone accumulation is the honest streaming
  * semantics; the `_sound` audit therefore checks the store against
  * its OWN accepted-edge log, and ComponentStoreSpec pins equality
  * with the from-scratch components where the cap doesn't bite.
  *
  * Crash safety is inherited from [[PersistedLayout.ensureWith]]:
  * the marker is invalidated before any dataset is touched and
  * stamped last, so every torn append state is rebuilt, never
  * half-loaded.
  */
object ComponentStore {

  private[text] val metaFile = "_graft_cc_meta"

  /** Driver bound on the edges a single append may collect — the same
    * rationale (and default) as [[DedupJobs.connectedComponents]]'
    * hybrid split: verified near-dup edges are the OUTPUT of dedup
    * detection, orders smaller than the corpus, and a batch's edge
    * set is further bounded by the batch. A pathological batch that
    * exceeds it ESCALATES TO THE FULL REBUILD instead of collecting
    * unbounded edges to the driver: the limit-guard throw below is
    * deliberately inside [[PersistedLayout.appendIfGrown]]'s guard,
    * whose catch turns any failed append attempt into `false` →
    * from-scratch build — correct components either way, at the
    * rebuild price the batch's size earned.
    */
  private val driverEdgeLimit = 2000000L

  private def wantFor(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, shingleN: Int, threshold: Double,
      maxBucket: Int): (Seq[String], String, Long) = {
    val (n, idsum) = PersistedLayout.fingerprint(docs, idCol, textCol)
    val config = Seq(
      s"k=$k", s"bands=$bands", s"shingleN=$shingleN", s"t=$threshold",
      s"mb=$maxBucket", s"id=$idCol", s"text=$textCol")
    (config, (config ++ Seq(s"n=$n", s"idsum=$idsum"))
      .mkString("\n") + "\n", n)
  }

  /** Whether the persisted layout already certifies EXACTLY this
    * (corpus, config) — lets an entry skip its build-up evolution on
    * a warm session. The check itself is one narrow fingerprint pass;
    * the subsequent [[loadOrBuild]] repeats it for its own marker
    * comparison (fingerprints are deliberately not cached across
    * calls — the corpus may change between them).
    */
  def isFresh(docs: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 100): Boolean = {
    val (_, want, _) = wantFor(docs, idCol, textCol, k, bands, shingleN,
      threshold, maxBucket)
    PersistedLayout.readMarker(docs.sparkSession, dir, metaFile)
      .contains(want)
  }

  /** Load the maintained components, appending the corpus delta (or
    * building from scratch) as needed. `digestStore` must be the
    * dedup-digest store over the SAME (grown) corpus, already brought
    * up to date — the entry wiring calls [[DedupStore.loadOrBuild]]
    * immediately before this; it is by-name so the Fresh path never
    * forces it.
    */
  /** Remap-row count past which an append FOLDS the remap into
    * `members` instead of rewriting it (round-12 verdict item 4): the
    * remap is driver-collected and rewritten whole per append, so
    * left unfolded it grows with roots-ever-merged for the store's
    * LIFETIME — fine at fleet scale, a slow driver leak at
    * corpus-lifetime web scale. The fold is one distributed
    * members⋈broadcast(remap) rewrite (amortized O(members) — each
    * member row is rewritten once per threshold-many merges), after
    * which the remap is EMPTY and resolution is a zero-row broadcast
    * join until roots merge again. 4096 rows ≈ 64 KiB on the driver:
    * far below any collect bound, frequent enough that the remap
    * broadcast stays trivially small.
    */
  private val remapFoldDefault = 4096

  /** Edge-log excess past which an append FOLDS the log to a spanning
    * structure (round-13 verdict item 5: `edges` grew append-only for
    * the store's LIFETIME — the same lifecycle smell the remap had
    * before its fold). The log exists to re-derive the components (the
    * `_sound` audit's ground truth), and a STAR per component — one
    * (root, member) edge for every non-root member, i.e. exactly the
    * resolved `members` rows — has the same connected components by
    * construction. When the log exceeds that compacted size by more
    * than this slack, one distributed rewrite replaces it with the
    * star; afterwards the log is bounded by members + slack + the
    * current batch instead of every pair ever accepted. Post-fold the
    * log is a spanning WITNESS rather than the raw accepted-pair
    * history; the audit keeps its force for everything appended since
    * the fold (a maintenance bug that mis-merges an arriving batch
    * still diverges from the log-derived components).
    */
  private val edgeFoldSlackDefault = 4096

  /** `rebaseline = true` forces a from-scratch build even when the
    * marker certifies the current corpus — the RE-BASELINE POLICY for
    * the documented monotone-cap asymmetry: batch appends keep the
    * edges a bucket contributed while under the skew cap even after
    * late arrivals push it past the cap, which is honest streaming
    * semantics but drifts monotonically from the corpus-wide-cap
    * from-scratch answer. A periodic (ops-scheduled) rebaseline
    * re-applies the cap corpus-wide and resets that drift; between
    * rebaselines the `_sound` audit's edge-log ground truth keeps the
    * store internally consistent.
    */
  def loadOrBuild(docs: DataFrame, idCol: String, textCol: String,
      dir: String, digestStore: => DataFrame,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 100,
      remapFoldThreshold: Int = remapFoldDefault,
      edgeFoldSlack: Int = edgeFoldSlackDefault,
      rebaseline: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    val (config, want, n) = wantFor(docs, idCol, textCol, k, bands,
      shingleN, threshold, maxBucket)
    def pairsOf(frame: DataFrame): DataFrame =
      DedupJobs.minhashCandidatePairs(frame, idCol, textCol, k, bands,
        shingleN, threshold, maxBucket)
    PersistedLayout.ensureWith(spark, dir, metaFile, want,
      rebuild = rebaseline) { old =>
      PersistedLayout.appendIfGrown(docs, idCol, textCol, old, config,
        n, Double.PositiveInfinity,
        spark.read.parquet(s"$dir/ids").select(col(idCol))) { delta =>
        appendStep(docs, delta, idCol, textCol, dir, digestStore,
          k, bands, shingleN, threshold, remapFoldThreshold, edgeFoldSlack)
      }
    } {
      // A crashed fold can leave its staging dir behind (the marker is
      // already gone, so the crash lands here); overwrite-mode writes
      // below never touch it — delete it so it cannot linger for the
      // store's lifetime.
      val fsb = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fsb.delete(new org.apache.hadoop.fs.Path(dir, "members__folding"), true)
      fsb.delete(new org.apache.hadoop.fs.Path(dir, "edges__folding"), true)
      fsb.delete(
        new org.apache.hadoop.fs.Path(dir, "edges_witness__folding"), true)
      val comps = DedupJobs.connectedComponents(pairsOf(docs))
      comps.select(col("doc_id").as(idCol), col("component").as("orig_root"))
        .write.mode("overwrite").parquet(s"$dir/members")
      emptyRemap(spark).write.mode("overwrite").parquet(s"$dir/remap")
      pairsOf(docs).select(col("id_a").cast("long"), col("id_b").cast("long"))
        .write.mode("overwrite").parquet(s"$dir/edges")
      docs.filter(col(textCol).isNotNull).select(col(idCol))
        .write.mode("overwrite").parquet(s"$dir/ids")
      // Witness seeded from the just-written RAW pair log (a parquet
      // re-read, not a third pair search), RESET rather than merged: a
      // rebuild starts a new store generation, and a prior generation's
      // witness may reference docs the new corpus no longer pairs.
      refreshWitness(spark, dir, spark.read.parquet(s"$dir/edges"),
        reset = true)
    } match {
      case PersistedLayout.Busy =>
        // A concurrent session is writing the layout: serve this call
        // from an in-memory from-scratch build (the cap caveat above
        // applies, documented; the degrade is loud in the plan, not
        // in results at non-adversarial bucket sizes).
        DedupJobs.connectedComponents(pairsOf(docs))
          .select(col("doc_id").as(idCol), col("component"))
      case _ => resolve(spark, dir, idCol)
    }
  }

  /** The maintained components: (idCol, component), one row per doc
    * that has ever appeared in a verified pair. ONE broadcast join —
    * the remap is fully path-compressed by construction.
    */
  def resolve(spark: SparkSession, dir: String, idCol: String): DataFrame = {
    val members = spark.read.parquet(s"$dir/members")
    val remap = spark.read.parquet(s"$dir/remap")
    members.join(broadcast(remap),
        members("orig_root") === remap("old_root"), "left")
      .select(col(idCol),
        coalesce(col("new_root"), col("orig_root")).as("component"))
  }

  /** The accepted-edge log — the `_sound` audit's ground truth. */
  def storedEdges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/edges")

  private def emptyRemap(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("old_root"),
      col("id").as("new_root"))

  /** One append: screen the delta against the digest store, verify
    * candidates exactly on candidate text only, then fold the new
    * edges into the persisted state — append members/edges/ids,
    * rewrite the (tiny) remap.
    */
  private def appendStep(docs: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, dir: String, store: DataFrame,
      k: Int, bands: Int, shingleN: Int, threshold: Double,
      remapFoldThreshold: Int, edgeFoldSlack: Int): Unit = {
    val spark = docs.sparkSession
    // Candidates in ONE pass: the store already holds the delta's own
    // digests, so batch-vs-store covers delta-internal AND
    // delta-vs-old pairs; old-old pairs cannot newly appear.
    val cand = DedupStore.screenNearCandidates(delta, idCol, textCol,
        store, k, bands, shingleN)
      .select(least(col(idCol), col("match_id")).cast("long").as("id_a"),
        greatest(col(idCol), col("match_id")).cast("long").as("id_b"))
      .distinct()
    // Exact verification fetches ONLY candidate ids' text — the same
    // candidates-then-verify split as the pair search; the corpus at
    // large contributes digests, never text.
    val candIds = cand.select(col("id_a").as("cid"))
      .unionByName(cand.select(col("id_b").as("cid"))).distinct()
    // Semi-join on the RAW rows first, tokenize after: the tokenize/
    // shingle kernel must run on candidates only by construction, not
    // by relying on PushDownLeftSemiAntiJoin to hoist the join above
    // a UDF projection. Cost shape at scale: one corpus (id, text)
    // scan with a BROADCAST semi-join — no shuffle, no per-doc kernel
    // outside the candidates; an id-bucketed corpus layout would
    // prune the scan to candidate buckets, the same trade as the
    // bucketed hub probe.
    val sh = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("cid"), col(textCol))
      .join(candIds, Seq("cid"), "left_semi")
      .select(col("cid"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("cid"),
        TextFunctions.shinglesOf(col("__toks"), shingleN).as("sh"))
    val verified = cand
      .join(sh.select(col("cid").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sh.select(col("cid").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .filter(DedupJobs.jaccardUdf(col("sh_a"), col("sh_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val lim = driverEdgeLimit.toInt
    val fetched = verified.limit(lim + 1).collect()
    // Escalation trigger, not an error surface: appendIfGrown's guard
    // converts this throw into a full-rebuild fallback (see
    // driverEdgeLimit's doc).
    require(fetched.length <= lim,
      s"ComponentStore append: batch produced more than $lim verified " +
        "edges — escalating to a full rebuild")
    val newEdges = fetched.map(r => (r.getLong(0), r.getLong(1)))

    // Current roots of every endpoint already in the store (an
    // endpoint absent from members is a new doc or an old singleton:
    // its current root is itself).
    import spark.implicits._
    val endpointIds = newEdges.flatMap(e => Seq(e._1, e._2)).distinct.toSeq
    val known: Array[(Long, Long)] =
      if (endpointIds.isEmpty) Array.empty
      else resolve(spark, dir, idCol)
        .join(broadcast(endpointIds.toDF(idCol)), Seq(idCol), "left_semi")
        .select(col(idCol).cast("long"), col("component").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))

    // Driver union-find by MIN label ([[DedupJobs.MinUnionFind]] —
    // the same merge rule as the from-scratch components) over the
    // new edges plus each known endpoint's (doc → current root) link.
    val uf = new DedupJobs.MinUnionFind
    newEdges.foreach { case (a, b) => uf.union(a, b) }
    known.foreach { case (id, root) => uf.union(id, root) }

    val knownIds = known.map(_._1).toSet
    val newMembers = endpointIds.filterNot(knownIds)
      .map(id => (id, uf.find(id)))
    // Remap: every current root displaced by the merge, PLUS the
    // existing entries re-pointed through the new merges so the table
    // stays path-compressed (new_root is always final).
    val oldRemap = spark.read.parquet(s"$dir/remap")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def finalOf(x: Long): Long = if (uf.contains(x)) uf.find(x) else x
    val displaced = known.map(_._2).distinct
      .collect { case r if finalOf(r) != r => (r, finalOf(r)) }
    val mergedRemap = (oldRemap.map { case (o, nr) => (o, finalOf(nr)) }
      ++ displaced).distinct

    // UPGRADE BACKFILL (round-16 review): a store written by a
    // pre-witness binary has raw history but no edges_witness dir —
    // and the accept-time refresh below would create one holding only
    // THIS batch, after which the fold could rewrite the pre-upgrade
    // log unsampled. Seed the reservoir from the existing raw log
    // FIRST (before the batch refresh and before any fold); fires at
    // most once per legacy store.
    locally {
      val fsw = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!fsw.exists(new org.apache.hadoop.fs.Path(dir, "edges_witness"))
          && fsw.exists(new org.apache.hadoop.fs.Path(dir, "edges")))
        refreshWitness(spark, dir, spark.read.parquet(s"$dir/edges"),
          reset = true)
    }
    if (newEdges.nonEmpty) {
      newEdges.toSeq.toDF("id_a", "id_b")
        .write.mode("append").parquet(s"$dir/edges")
      // Witness refreshed from the RAW verified batch, before any fold
      // can rewrite it (round-16 advice — see the layout doc). Skipped
      // when the batch accepted nothing, so a quiet append pays no
      // extra job.
      refreshWitness(spark, dir,
        newEdges.toSeq.toDF("id_a", "id_b"), reset = false)
    }
    if (newMembers.nonEmpty)
      newMembers.toSeq.toDF(idCol, "orig_root")
        .write.mode("append").parquet(s"$dir/members")
    if (mergedRemap.length >= remapFoldThreshold && remapFoldThreshold > 0)
      foldRemap(spark, dir, idCol, mergedRemap)
    else
      mergedRemap.toSeq.toDF("old_root", "new_root")
        .write.mode("overwrite").parquet(s"$dir/remap")
    delta.select(col(idCol)).write.mode("append").parquet(s"$dir/ids")
    // Edge-log fold LAST (it reads resolve(), which needs the remap
    // just written): compact once the log exceeds its spanning size by
    // more than the slack. Both counts come straight from the parquet
    // FOOTERS (round-15 advice: `read.parquet(...).count()` launches a
    // Spark job per store dataset per append even when no fold fires —
    // the footer row counts are the same numbers for free).
    val edgeCount = footerRowCount(spark, s"$dir/edges")
    val memberCount = footerRowCount(spark, s"$dir/members")
    if (edgeCount - memberCount > edgeFoldSlack.toLong)
      foldEdges(spark, dir, idCol)
  }

  /** Exact row count of a parquet dataset from its file footers — a
    * driver-side metadata read (one footer per data file, no Spark
    * job). Parquet footers record the row count per row group, so the
    * sum is exact for any dataset; a missing dir reads as 0 (a store
    * that has not appended that dataset yet).
    */
  private[text] def footerRowCount(spark: SparkSession,
      dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** Fold the accepted-edge log to the spanning STAR of the resolved
    * components — one (root, member) edge per non-root member; the
    * root of every component is its min label, so the member rows
    * themselves are the star with id_a = component ≤ id_b = doc.
    * Connected components over the star equal the store's resolution
    * by construction (every member row is one union with its root),
    * so [[storedEdges]]-derived audits are unchanged. Same staging +
    * rename swap and crash story as [[foldRemap]].
    */
  private def foldEdges(spark: SparkSession, dir: String,
      idCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(dir, "edges")
    // The fold no longer touches the witness (round-16): the reservoir
    // is maintained at ACCEPT time (build seed + per-append refresh),
    // so by the time a fold fires every raw pair being folded away has
    // already had its sampling chance — and the fold's own star output
    // can never leak into the sample.
    val star = resolve(spark, dir, idCol)
      .filter(col(idCol) =!= col("component"))
      .select(col("component").cast("long").as("id_a"),
        col(idCol).cast("long").as("id_b"))
    val staging = new org.apache.hadoop.fs.Path(dir, "edges__folding")
    if (fs.exists(staging)) fs.delete(staging, true)
    star.write.parquet(staging.toString)
    fs.delete(live, true)
    require(fs.rename(staging, live),
      s"could not rename $staging into $live")
  }

  /** Witness-sample bound: one parquet-file-sized slab of pair rows —
    * the same budget class as [[edgeFoldSlackDefault]], kept flat for
    * the store's lifetime (each refresh re-caps the merged sample).
    */
  private val witnessCap = 4096

  /** Merge `raw` accepted pairs into the bounded witness reservoir:
    * union with the prior sample (unless `reset` — a from-scratch
    * build starts a new generation), dedupe, re-cap by a pseudo-random
    * (xxhash64) order so the sample spreads uniformly over the store's
    * whole accept history instead of favoring low ids or late batches.
    * Staged-write + rename (the merge lazily READS the live witness —
    * an in-place overwrite would read-under-write); a crash between
    * delete and rename is healed by the marker discipline (the marker
    * is invalid while any append/build runs, so a torn witness reads
    * as "stale → rebuild", which re-seeds it).
    */
  private def refreshWitness(spark: SparkSession, dir: String,
      raw: DataFrame, reset: Boolean): Unit = {
    val pairs = raw.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val merged =
      (if (reset) pairs else pairs.unionByName(witnessEdges(spark, dir)))
        .distinct()
        .orderBy(xxhash64(col("id_a"), col("id_b")), col("id_a"), col("id_b"))
        .limit(witnessCap)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val wLive = new org.apache.hadoop.fs.Path(dir, "edges_witness")
    val wStaging = new org.apache.hadoop.fs.Path(dir, "edges_witness__folding")
    if (fs.exists(wStaging)) fs.delete(wStaging, true)
    merged.write.parquet(wStaging.toString)
    if (fs.exists(wLive)) fs.delete(wLive, true)
    require(fs.rename(wStaging, wLive),
      s"could not rename $wStaging into $wLive")
  }

  /** The bounded raw-pair witness sample ([[refreshWitness]]) —
    * seeded at build, refreshed per accepting append, untouched by
    * folds. Audits should union this with [[storedEdges]] — witness
    * pairs were genuinely accepted raw, so they must still land
    * inside one resolved component each.
    */
  def witnessEdges(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir, "edges_witness")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.range(0).select(col("id").as("id_a"), col("id").as("id_b"))
  }

  /** Fold the remap into `members`: rewrite every member's orig_root
    * to its CURRENT root through one distributed broadcast join, then
    * truncate the remap to empty — resolution semantics are identical
    * (resolve is exactly this join), so the fold is invisible to
    * readers except that the remap stops growing. Staged beside the
    * live dataset and swapped by rename; crash windows anywhere in
    * here are healed by [[PersistedLayout.ensureWith]]'s
    * invalidate-first/stamp-last marker discipline (the marker is
    * already gone while appendStep runs — a torn fold reads as
    * "stale → rebuild", never half-loads).
    */
  private def foldRemap(spark: SparkSession, dir: String, idCol: String,
      remap: Array[(Long, Long)]): Unit = {
    import spark.implicits._
    val remapDf = remap.toSeq.toDF("old_root", "new_root")
    val members = spark.read.parquet(s"$dir/members")
    val folded = members.join(broadcast(remapDf),
        members("orig_root") === remapDf("old_root"), "left")
      .select(col(idCol),
        coalesce(col("new_root"), col("orig_root")).as("orig_root"))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(dir, "members")
    val staging = new org.apache.hadoop.fs.Path(dir, "members__folding")
    if (fs.exists(staging)) fs.delete(staging, true)
    folded.write.parquet(staging.toString)
    fs.delete(live, true)
    require(fs.rename(staging, live),
      s"could not rename $staging into $live")
    emptyRemap(spark).write.mode("overwrite").parquet(s"$dir/remap")
  }
}
