package graft.text

import graft.{Checkpoint, SessionCache}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond per-document kernels: repetition
  * quality filters, benchmark decontamination, and mixture
  * re-weighting — the steps between "documents scored" and "training
  * set assembled" in a large-scale data pipeline.
  *
  * All three are declarative DataFrame plans: repetition shuffles
  * (doc, gram) with map-side combine; decontamination broadcasts the
  * (small) benchmark gram set so the corpus never shuffles for the
  * membership test; mixing aggregates to one row per stratum.
  */
object CurationOps {

  import TextFunctions.{gramsOf, shinglesOf, tokens}

  /** First 4 hex chars of md5(id) — the shared determinism-critical
    * hashing idiom behind split assignment, manifest splits, and
    * sampling uniforms. One definition so the cast and bounds can
    * never drift between the engines' parity-checked call sites.
    */
  private def idHash4(idCol: String): Column =
    substring(md5(col(idCol).cast("string")), 1, 4)

  /** The ≈90/5/5 split label from the 4-hex-digit id hash — ONE
    * definition finishing the [[idHash4]] hoist's stated purpose:
    * trainManifest's manifest splits and splitAssign's reported split
    * counts can never disagree on the thresholds.
    */
  private def splitOf(h: Column): Column =
    when(h < "e666", "train").when(h < "f333", "val").otherwise("test")

  /** Gopher-style repetition metrics per document (Rae et al. 2021,
    * "Scaling Language Models", Table A1 — adapted to word n-grams):
    * the fraction of n-gram occurrences taken by the single most
    * frequent n-gram (`top_gram_frac`) and the fraction belonging to
    * any n-gram occurring more than once (`dup_gram_frac`). Boilerplate
    * and degenerate machine text score high on both; the pass flag
    * applies the thresholds.
    *
    * Shape: explode to (doc, gram), count per (doc, gram), re-aggregate
    * per doc — both aggregations partial-aggregate map-side, and the
    * shuffle key (doc_id, gram) is near-unique so no hot keys exist at
    * corpus scale. Documents shorter than n tokens have no n-grams and
    * pass trivially (left join back onto the corpus spine, zero fill).
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, topFracMax: Double = 0.2,
      dupFracMax: Double = 0.6): DataFrame = {
    // explode_outer + isNotNull, NOT explode: InferFiltersFromGenerate
    // rewrites inner explode to Filter(size(<generator arg>) > 0) with
    // the WHOLE gram expression inlined — after pushdown the tokenizer
    // re-evaluates at every lambda position inside the interpreted
    // predicate (measured 8x the scan cost at sf0.1). The rule skips
    // outer generate; the null filter on the GENERATED column restores
    // inner-explode semantics for pennies.
    val grams = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode_outer(gramsOf(col("__toks"), n)).as("gram"))
      .filter(col("gram").isNotNull)
    val perGram = grams.groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
    val perDoc = perGram.groupBy(idCol).agg(
      sum(col("cnt")).as("n_grams"),
      max(col("cnt")).as("top_cnt"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_cnt"))
    // Null-safe spine join (<=>): a null-id doc's grams aggregate
    // under the null key, and a plain equi-join would hand that doc
    // zero-filled metrics — a boilerplate-stuffed null-id doc would
    // pass the gate unexamined (the twoLevelRank null-key lesson).
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed(idCol, "__rid"),
        col(idCol) <=> col("__rid"), "left")
      .drop("__rid")
      .na.fill(0L, Seq("n_grams", "top_cnt", "dup_cnt"))
      .select(col(idCol), col("n_grams"),
        round(when(col("n_grams") > 0,
          col("top_cnt") / col("n_grams").cast("double")).otherwise(0.0), 4)
          .as("top_gram_frac"),
        round(when(col("n_grams") > 0,
          col("dup_cnt") / col("n_grams").cast("double")).otherwise(0.0), 4)
          .as("dup_gram_frac"))
      .withColumn("pass_repetition",
        col("top_gram_frac") <= topFracMax && col("dup_gram_frac") <= dupFracMax)
  }

  /** Benchmark decontamination: for every corpus document, the overlap
    * of its distinct word n-grams with the union of the benchmark's
    * n-grams (the standard eval-leakage check — e.g. GPT-3 appendix C /
    * PaLM's 13-gram variant, shortened here to fit short documents).
    * Emits per-doc distinct-gram count, hit count, contamination
    * fraction, and a flag at `threshold`.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus
    * (eval suites, not training data), so its distinct gram set is
    * BROADCAST and the membership test is a map-side semi join — the
    * corpus is never shuffled for matching, only the per-doc hit count
    * aggregates on doc_id.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shinglesOf(col("__toks"), n).as("grams"))
    // outer + isNotNull everywhere a computed array is exploded — see
    // repetitionMetrics on InferFiltersFromGenerate.
    val benchGrams = grams(benchmark)
      .select(explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull).distinct()
      .withColumn("__hit", lit(1))
    // ONE corpus pass: grams exploded once, membership tested by a
    // broadcast left join, and both the per-doc gram count and the hit
    // count fall out of the same aggregation (the grams are distinct
    // per doc, so count(*) of the explode equals the gram-set size).
    // The two-frame form (semi-join for hits + a second projection for
    // sizes) tokenized the corpus twice — measured 2x this plan's scan
    // cost at sf0.01.
    grams(corpus)
      .select(col(idCol), explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_hits"))
      .withColumn("contamination",
        round(col("n_hits") / col("n_grams").cast("double"), 4))
      .withColumn("contaminated", col("contamination") >= threshold)
  }

  /** Bloom-prefiltered decontamination — the corpus-scale variant of
    * [[contamination]]. Pass 1 streams the corpus grams through a
    * BLOOM FILTER of the benchmark gram set (a few MB regardless of
    * corpus size; pure map-side test, no join, no shuffle of corpus
    * bytes): documents with zero bloom hits — the overwhelming
    * majority of a clean corpus — are eliminated before any join
    * exists. Pass 2 re-scores ONLY the surviving candidates with the
    * exact broadcast-membership join of [[contamination]]. Bloom
    * filters have NO false negatives, so candidates ⊇ {docs with any
    * true hit} and the emitted report (docs with ≥ 1 exact hit,
    * exact counts) EQUALS the exact computation — a false positive
    * costs one re-check, never a wrong row. This is the 100 TB shape:
    * the exact path touches only the contaminated sliver, and the
    * filter stays small even when the benchmark gram set outgrows a
    * broadcast hash set.
    *
    * The benchmark side is tokenized twice (bloom build + exact join
    * table) — it is the EVAL suite, orders of magnitude smaller than
    * the corpus; a persist would cost more bookkeeping than the
    * recompute.
    */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.5,
      expectedGrams: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shinglesOf(col("__toks"), n).as("grams"))
    def benchGrams = grams(benchmark)
      .select(explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull).distinct()
    val bf = benchGrams.stat.bloomFilter("gram", expectedGrams, fpp)
    val bcBf = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightHit = udf { g: String => bcBf.value.mightContain(g) }
    val cand = grams(corpus)
      .select(col(idCol), explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
      .filter(mightHit(col("gram")))
      .select(col(idCol)).distinct()
    // Pass 2 delegates to the exact kernel over the surviving sliver —
    // ONE definition of the scoring, so the bloom path cannot drift
    // from the exact path it is documented to equal. The candidate
    // semi-join carries no broadcast hint: cand is data-dependent
    // (tiny for a clean corpus, corpus-sized when the benchmark shares
    // boilerplate with it) — let the planner/AQE pick broadcast vs
    // shuffle by size.
    contamination(corpus.join(cand, Seq(idCol), "left_semi"),
        benchmark, idCol, textCol, n, threshold)
      .filter(col("n_hits") > 0)
  }

  /** Materialize the [[temperatureMix]] rates as a deterministic
    * importance-sampling manifest: each document gets
    * `n_copies = floor(rate) + [u < frac(rate)]`, where `u` is a
    * 16-bit md5-uniform of the doc id — E[n_copies] = the stratum's
    * sampling rate, with no RNG state, identical on every engine and
    * at every scale (downsampled strata drop docs, upsampled strata
    * repeat them — the epoch-repetition semantics of temperature
    * mixing). Map-side after a broadcast of the per-stratum rates; the
    * training set materializes downstream as an explode on n_copies.
    */
  def mixApply(docs: DataFrame, byCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    // Null-safe stratum join: temperatureMix emits a rate row for a
    // null stratum, and a plain equi-join would silently drop those
    // docs from the manifest (the twoLevelRank null-key lesson).
    val rates = temperatureMix(docs, byCol, alpha)
      .select(col(byCol).as("__mx_by"), col("sampling_rate"))
    // 4 hex chars -> [0, 1) in steps of 2^-16; division by a power of
    // two is exact, so u is bit-identical across engines.
    val u = conv(idHash4(idCol), 16, 10).cast("int") / 65536.0
    docs.select(col(idCol), col(byCol))
      .join(broadcast(rates), col(byCol) <=> col("__mx_by"))
      .withColumn("n_copies",
        (floor(col("sampling_rate")) +
          when(u < col("sampling_rate") - floor(col("sampling_rate")), 1)
            .otherwise(0)).cast("long"))
      .select(col(idCol), col(byCol), col("sampling_rate"), col("n_copies"))
  }

  /** Corpus mix report: per-stratum class-distribution entropy (nats)
    * plus doc/class counts — the diagnostic read before choosing
    * [[temperatureMix]] weights. Two partial-agg shuffles, both tiny
    * after the map-side combine. Floating determinism: the entropy
    * terms fold over a class-SORTED array with a 0.0 seed (group-order
    * summation would be nondeterministic across runs and engines), and
    * `round(…, 6)` absorbs ln()'s last-ulp slack (the BM25 entry's
    * convention).
    */
  def sourceMix(docs: DataFrame, stratumCol: String,
      classCol: String): DataFrame =
    docs
      .groupBy(stratumCol, classCol).agg(count(lit(1)).as("n"))
      .groupBy(stratumCol).agg(
        sum("n").as("n_docs"),
        count(lit(1)).as("n_langs"),
        array_sort(collect_list(struct(col(classCol), col("n"))))
          .as("__xs"))
      .select(col(stratumCol), col("n_docs"), col("n_langs"),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) =>
          acc - (x.getField("n") / col("n_docs")) *
            log(x.getField("n") / col("n_docs"))), 6).as("entropy"))

  /** End-to-end training manifest — the curation steps composed into
    * ONE declarative plan, the artifact a training run actually
    * consumes: (1) quality gate (≥ `minTokens` tokens), (2) exact
    * dedup keeping the first doc per canonical fingerprint,
    * (3) deterministic 90/5/5 hash-range split (the q_split_assign
    * rule), (4) a reproducible training order for the train split
    * (md5-keyed [[graft.Ranking.twoLevelRank]]; val/test rows carry a
    * null position). Catalyst fuses the gate+fingerprint into the
    * scan projection; the dedup and split stay digest-only shuffles;
    * ranking adds one bucketed window plus a broadcast histogram — no
    * stage funnels the corpus through one task.
    */
  def trainManifest(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20): DataFrame = {
    val kept = docs
      .select(col(idCol), col(textCol),
        size(tokens(col(textCol))).as("__ntok"))
      .filter(col("__ntok") >= minTokens)
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    val canon = kept.groupBy("__fp").agg(min(col(idCol)).as(idCol))
    val split = canon.select(col(idCol),
      splitOf(idHash4(idCol)).as("split"))
    val train = split.filter(col("split") === "train")
      .withColumn("__key", md5(concat_ws("|", lit(0), col(idCol))))
      .withColumn("__bkt", substring(col("__key"), 1, 2))
    val ranked = graft.Ranking.twoLevelRank(train, partCols = Nil,
        bucketCol = "__bkt", bucketAsc = true,
        tieCols = Seq("__key", idCol), out = "position")
      .select(col(idCol), col("position"))
    split.join(ranked, Seq(idCol), "left")
      .select(col(idCol), col("split"), col("position"))
  }

  /** Per-source distribution-drift report: the two-sample
    * Kolmogorov–Smirnov statistic between each source's token-count
    * distribution and the REST of the corpus — the standard
    * data-quality gate for "did this feed change shape" (ingest
    * monitoring, crawl-snapshot comparison). KS = max |F_s − F_rest|
    * over the union support.
    *
    * Scale shape: the corpus reduces map-side to a (source, length)
    * histogram — the only corpus-sized pass; everything after runs on
    * the histogram, whose size is sources × distinct document lengths
    * (bounded by max document tokens, NOT corpus rows). The per-source
    * ECDF windows therefore sort tiny frames; rest-of-corpus counts
    * come from the global histogram minus the source's, so no
    * source×source pair join exists.
    */
  def sourceDrift(docs: DataFrame, byCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Null text is excluded on both engines (same convention as
    // budgetFill): a null length row would enter the totals but never
    // match the support join, and the engines disagree on where a
    // null support value sorts in the ECDF window.
    // four consumers (glob, sources, fill probe, totals) — pin the
    // tiny histogram so the tokenizing scan runs once (lazy: the first
    // action materializes it; Checkpoint.pin picks the session's
    // local-vs-reliable storage contract)
    val hist = Checkpoint.pin(docs.filter(col(textCol).isNotNull)
      .select(col(byCol), size(tokens(col(textCol))).cast("long").as("v"))
      .groupBy(col(byCol), col("v")).agg(count(lit(1)).as("n")),
      eager = false)
    val glob = hist.groupBy(col("v")).agg(sum(col("n")).as("gn"))
    val sources = hist.select(col(byCol)).distinct()
    // Full union support per source (a source missing a length still
    // steps the OTHER distribution's ECDF there).
    val support = sources.crossJoin(glob)
    // Null-safe source key on both joins: a groupBy keeps a null-source
    // group, and a plain equi-join would silently drop its histogram
    // mass (the twoLevelRank lesson).
    val histA = hist.select(col(byCol).as("__s"), col("v").as("__v"),
      col("n"))
    val filled = support
      .join(histA, col(byCol) <=> col("__s") && col("v") === col("__v"),
        "left")
      .drop("__s", "__v")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy(col(byCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = filled
      .withColumn("cs", sum(col("n")).over(w))
      .withColumn("cg", sum(col("gn")).over(w))
    val totals = hist.groupBy(col(byCol)).agg(sum(col("n")).as("ts"))
      .select(col(byCol).as("__s"), col("ts"))
    val tg = glob.agg(sum(col("gn")).as("tg"))
    cum.join(totals, col(byCol) <=> col("__s")).drop("__s").crossJoin(tg)
      .withColumn("gap", when(col("tg") > col("ts"),
        abs(col("cs") / col("ts").cast("double") -
          (col("cg") - col("cs")) / (col("tg") - col("ts")).cast("double")))
        .otherwise(lit(0.0)))
      .groupBy(col(byCol))
      .agg(first(col("ts")).as("n_docs"),
        round(max(col("gap")), 6).as("ks_stat"))
  }

  /** Quality-ranked token-budget fill — the curation step that answers
    * "which documents make the training set when we can only afford N
    * tokens per stratum": within each stratum, documents are taken in
    * (quality DESC, id) order until the token budget is exhausted (a
    * document is IN when the tokens strictly preceding it fit the
    * budget — same start-convention as [[packSequences]]). Emits the
    * per-stratum kept count, kept tokens, and the quality cut line.
    *
    * The running sum is [[graft.Ranking.twoLevelPrefixSum]] — never a
    * per-stratum single-task window. The bucket combines the quality
    * level (quality_score sits on an exact 0.25 grid, so
    * `(1 − q) · 4` is an exact small int ascending in DESCENDING
    * quality) with the [[packSequences]] id coarsening, keeping the
    * per-bucket windows at corpus/(strata · 1280) rows.
    */
  def budgetFill(docs: DataFrame, idCol: String, byCol: String,
      textCol: String, budget: Long = 2000L): DataFrame = {
    // Null text is excluded up front: it carries no tokens to spend
    // budget on, and Spark's legacy sizeOfNull would otherwise count
    // it as −1 tokens, silently corrupting the running sum (and
    // diverging from a SQL engine's NULL-skipping SUM).
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(byCol),
        TextFunctions.qualityComponents(col(textCol)).as("__q"))
      .select(col(idCol), col(byCol),
        col("__q.n_tokens").cast("long").as("n_tokens"),
        col("__q.quality_score").as("quality"))
    val level = ((lit(1.0) - col("quality")) * 4).cast("int")
    val numericId = docs.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bucketed = idRangeBucket(base, idCol, numericId, Some(level))
    graft.Ranking.twoLevelPrefixSum(bucketed, partCols = Seq(byCol),
        bucketCol = "__bkt", bucketAsc = true, tieCols = Seq(idCol),
        valCol = "n_tokens", out = "__pre")
      .filter(col("__pre") < budget)
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_kept"),
        min(col("quality")).as("cutoff_quality"))
  }

  /** Exact duplicated-substring span report (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * ExactSubstr, re-expressed at word-`n`-gram granularity instead of
    * suffix arrays). A position-`i` `n`-gram is DUPLICATED when the
    * identical token run occurs anywhere else in the corpus (another
    * doc, or the same doc again); consecutive duplicated positions
    * merge into spans. Per doc: total gram positions, duplicated
    * positions, the longest duplicated run, and the duplicated
    * fraction — the inputs to span-level cut/keep decisions.
    *
    * Shape: positional grams (map-side `transform`/`slice`, no join),
    * reduced map-side to a 128-bit gram key (two seeded `xxhash64`
    * runs — birthday-safe past 10¹¹ distinct grams) so the positional
    * frame shuffles 16 bytes per row instead of the raw token run.
    * The global occurrence count is a `groupBy(key).count()` — partial
    * aggregation combines a hot boilerplate gram map-side, so the
    * reduce side sees one pre-combined row per upstream partition, not
    * one task holding every occurrence (the Zipfian cliff a
    * `count over (partition by gram)` window would hit; a window
    * partition cannot be skew-split, a join can — AQE
    * OptimizeSkewedJoin handles the join-back). Then per-doc islands
    * (`pos − row_number`) on the duplicated sliver only. Docs shorter
    * than `n` tokens emit zero gram positions.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, materialize: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    def grams = toks
      .select(col(idCol), posexplode_outer(gramsOf(col("__toks"), n)))
      .toDF(idCol, "pos", "gram")
      .filter(col("gram").isNotNull)
      .select(col(idCol), col("pos"),
        xxhash64(col("gram")).as("__h1"),
        xxhash64(lit("graft.spans.h2"), col("gram")).as("__h2"))
    val totals = toks.select(col(idCol),
      greatest(size(col("__toks")) - (n - 1), lit(0)).cast("long")
        .as("n_grams"))
    // The materialized word-gram frame is session-shared like the char
    // frame (one ~5×-text pin per (session, input, n), warm on repeat
    // calls); spanReport must not pin again. Bounded group + pinned
    // registration: see charGramsMaterialized.
    val key = s"sem=${graft.PlanKey.of(docs)}|$idCol|$textCol|n=$n"
    val dup =
      if (materialize) {
        val pinned = SessionCache.getOrBuildBounded(docs.sparkSession,
          s"wordgrams|$key", group = SpanFrameGroup,
          maxPerGroup = MaxSpanFrames) {
          val g = Checkpoint.pin(grams)
          (g, Seq(g))
        }
        dupPositionsCached(pinned, s"word|$key")
      } else dupPositions(grams)
    spanReport(dup, totals, idCol)
  }

  /** The duplicated-position sliver both span reports consume — rows
    * of `grams` whose 128-bit gram key occurs ≥ 2 times anywhere in
    * the corpus (one definition, so [[spanReport]] and [[spanCut]] can
    * never disagree on WHICH positions count as duplicated; the
    * `groupBy` occurrence count partial-aggregates hot grams map-side,
    * see [[dupSpans]]).
    */
  private def dupPositions(grams: DataFrame): DataFrame = {
    val occ = grams.groupBy("__h1", "__h2")
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= 2)
    grams.join(occ, Seq("__h1", "__h2"))
  }

  /** Session-shared pinned [[dupPositions]] sliver (round-16): the
    * occurrence count + join-back over the full positional frame is
    * the dominant per-call cost of BOTH char-span entries (report and
    * cut read literally the same duplicated positions), and the word
    * report pays the same shape. One pinned sliver per (session,
    * input, granularity), the same bounded-LRU group as the gram
    * frames it derives from. Only the `materialize = true` paths
    * route here — the storage-free recompute path stays pin-free.
    */
  private def dupPositionsCached(grams: DataFrame, key: String): DataFrame =
    SessionCache.getOrBuildBounded(grams.sparkSession, s"duppos|$key",
      group = SpanFrameGroup, maxPerGroup = MaxSpanFrames) {
      val p = Checkpoint.pin(dupPositions(grams))
      (p, Seq(p))
    }

  /** Shared island-merge kernel behind [[dupSpans]] and
    * [[dupSpansChars]]: from a positional frame of 128-bit gram keys,
    * count global occurrences (`groupBy` — partial aggregation absorbs
    * hot boilerplate grams map-side; see [[dupSpans]]), keep positions
    * whose gram occurs ≥ 2 times anywhere, and merge consecutive
    * duplicated positions into runs via the `pos − row_number` island
    * trick. The per-doc window is bounded by document length, never by
    * corpus size.
    */
  private def spanReport(dupRaw: DataFrame, totals: DataFrame,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `dupRaw` is the duplicated-position sliver ([[dupPositions]]).
    // The positional frame behind it feeds BOTH the occurrence count
    // and the join-back probe; without materialization the generation
    // subtree (tokenize/substring + hash) executes twice — once per
    // join side (measured 1.5× the entry cost at sf0.1).
    // Materialization policy lives in the CALLERS: with
    // materialize = true they pass the session-shared pinned sliver
    // over the session-shared gram frame (see charGramsMaterialized /
    // dupPositionsCached — gram storage is positions × ~32 B, ~5× the
    // raw text for word grams and ~30× for char windows); with
    // materialize = false they pass the raw recompute subtree and pay
    // the second pass at zero checkpoint storage. The recompute path
    // is output-identical — proven (not just offered) by
    // CurationSpec's planted-fixture equality cases and
    // TextScaleSpec's 20k-doc hot-gram rehearsal.
    val dup = dupRaw
      .withColumn("__grp", col("pos") -
        row_number().over(Window.partitionBy(col(idCol)).orderBy("pos")))
    val runs = dup.groupBy(col(idCol), col("__grp"))
      .agg(count(lit(1)).as("__run"))
    val stats = runs.groupBy(idCol)
      .agg(sum("__run").as("__n_dup"), max("__run").as("__max_run"))
    // Null-safe spine join: a null-id doc's runs aggregate under the
    // null key and a plain equi-join would report n_dup = 0 for it.
    totals
      .join(stats.withColumnRenamed(idCol, "__rid"),
        col(idCol) <=> col("__rid"), "left")
      .drop("__rid")
      .select(col(idCol), col("n_grams"),
        coalesce(col("__n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("__max_run"), lit(0L)).as("max_run"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(
            coalesce(col("__n_dup"), lit(0L)) / col("n_grams").cast("double"),
            4)).as("dup_frac"))
  }

  /** Bounded-LRU group for the session-shared span frames: the char
    * frame is ~30× the raw text, so a long session scanning many
    * distinct inputs must not accumulate one pinned frame per input —
    * at most [[MaxSpanFrames]] (word + char gram frames plus their
    * [[dupPositionsCached]] slivers) stay live, the oldest released
    * (blocks dropped) on overflow. 8 covers every in-repo pipeline
    * (word + char frame + two slivers per active input, two inputs in
    * flight).
    */
  private val SpanFrameGroup = "spanframes"
  private val MaxSpanFrames = 8

  /** The materialized char-gram frame, built ONCE per (session, input,
    * k) and shared by [[dupSpansChars]] and [[spanCut]] — both reports
    * read the identical positional frame, and producing the ~30×-text
    * pin twice was the two entries' dominant cost (the LSH-search
    * [[graft.SessionCache]] pattern; keyed by the input plan's
    * semantic hash like ngramJaccardPairs). Materialization goes
    * through [[graft.Checkpoint.pin]] — set
    * `graft.checkpoint.reliable=true` (+ `setCheckpointDir`) for the
    * executor-loss-survivable HA path, or pass `materialize = false`
    * to the reports for the storage-free recompute path (spec-proven
    * output-identical).
    */
  private def charGramsMaterialized(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    SessionCache.getOrBuildBounded(docs.sparkSession,
      s"chargrams|sem=${graft.PlanKey.of(docs)}|" +
        s"$idCol|$textCol|k=$k", group = SpanFrameGroup,
      maxPerGroup = MaxSpanFrames) {
      val g = Checkpoint.pin(charGrams(docs, idCol, textCol, k))
      (g, Seq(g))
    }

  /** Positional char-`k`-gram frame: one row per window start, keyed by
    * the same 128-bit double hash as the word-gram path so the shuffle
    * never carries substrings. The text column rides along only until
    * the map-side hash projection.
    */
  private def charGrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val base = docs.select(col(idCol), col(textCol),
      length(col(textCol)).as("__len"))
    val starts = when(col("__len") < k || col("__len").isNull,
        array().cast("array<int>"))
      .otherwise(sequence(lit(0), col("__len") - k))
    // explode_outer + isNotNull, not inner explode — see
    // repetitionMetrics on InferFiltersFromGenerate.
    base
      .select(col(idCol), col(textCol), explode_outer(starts).as("pos"))
      .filter(col("pos").isNotNull)
      .select(col(idCol), col("pos"),
        xxhash64(col(textCol).substr(col("pos") + 1, lit(k))).as("__h1"),
        xxhash64(lit("graft.spans.h2"),
          col(textCol).substr(col("pos") + 1, lit(k))).as("__h2"))
  }

  /** Char-level ExactSubstr span report (Lee et al. 2022's granularity:
    * duplicated runs of ≥ `k` CHARACTERS, the suffix-array criterion
    * re-expressed as rolling char-`k`-gram windows — a char position
    * window is duplicated iff the identical `k`-char substring occurs
    * anywhere else in the corpus, and maximal duplicated substrings of
    * length L ≥ k show up as runs of L − k + 1 consecutive duplicated
    * positions). Same output shape and island kernel as the word-gram
    * [[dupSpans]]; `n_grams` counts char window positions.
    */
  def dupSpansChars(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 30, materialize: Boolean = true): DataFrame = {
    val totals = docs.select(col(idCol),
      greatest(length(col(textCol)) - (k - 1), lit(0)).cast("long")
        .as("n_grams"))
    // materialize = true reads the session-shared gram frame AND the
    // session-shared duplicated sliver over it (spanCut over the same
    // input reuses both — see charGramsMaterialized /
    // dupPositionsCached).
    if (materialize)
      spanReport(charDupPositions(docs, idCol, textCol, k), totals, idCol)
    else
      spanReport(dupPositions(charGrams(docs, idCol, textCol, k)), totals,
        idCol)
  }

  /** The cached char-gram duplicated sliver shared by the report and
    * the cut (both consume literally the same duplicated positions).
    */
  private def charDupPositions(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    dupPositionsCached(charGramsMaterialized(docs, idCol, textCol, k),
      s"char|sem=${graft.PlanKey.of(docs)}|$idCol|$textCol|k=$k")

  /** The APPLY step of char-level ExactSubstr dedup: per document, the
    * union of characters covered by any duplicated `k`-char window —
    * the exact character budget a span-cut pass would remove — plus the
    * merged-interval count. Two duplicated windows starting at p₁ < p₂
    * cover contiguous text iff p₂ − p₁ ≤ k, so merged islands fall out
    * of a lag-gap flag and a running flag sum (per-doc windows, bounded
    * by document length); each island covers `last − first + k` chars.
    * The only corpus-scale shuffle is the same hashed-gram occurrence
    * count as [[dupSpansChars]].
    */
  def spanCut(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 30, materialize: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Same double-execution story and storage trade as spanReport;
    // materialize = true reads the session-shared frame (built once
    // for this report AND dupSpansChars — see charGramsMaterialized),
    // materialize = false trades the second generation pass for zero
    // checkpoint storage (equality of the two paths is spec-proven —
    // see spanReport).
    val dup =
      if (materialize) charDupPositions(docs, idCol, textCol, k)
      else dupPositions(charGrams(docs, idCol, textCol, k))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = dup
      .withColumn("__gap",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > k, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__gap")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg((max(col("pos")) - min(col("pos")) + k).cast("long")
        .as("__covered"))
    val stats = islands.groupBy(idCol)
      .agg(sum(col("__covered")).as("__covered"),
        count(lit(1)).as("__n_islands"))
    docs
      .select(col(idCol),
        coalesce(length(col(textCol)), lit(0)).cast("long").as("n_chars"))
      // null-safe like spanReport's spine join
      .join(stats.withColumnRenamed(idCol, "__rid"),
        col(idCol) <=> col("__rid"), "left")
      .drop("__rid")
      .select(col(idCol), col("n_chars"),
        coalesce(col("__covered"), lit(0L)).as("covered_chars"),
        coalesce(col("__n_islands"), lit(0L)).as("n_islands"),
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(round(coalesce(col("__covered"), lit(0L)) /
            col("n_chars").cast("double"), 4)).as("cut_frac"))
  }

  /** Paragraph-level corpus dedup (the C4/RefinedWeb line-dedup step):
    * split each document on newlines, keep only the globally FIRST
    * occurrence of each distinct paragraph (first = least (doc, pos)),
    * and report per document the paragraph count, surviving count, and
    * the fingerprint of the document reassembled from its surviving
    * paragraphs in original order.
    *
    * Scale shape: the winner per paragraph digest is a
    * `groupBy(digest).agg(min(struct(doc, pos)))` — partial aggregation
    * combines a boilerplate paragraph's 10⁸ occurrences map-side (the
    * `row_number over (partition by digest)` form would funnel them
    * into one task). Winners join back on the near-unique (doc, pos)
    * key — never on the skewed digest — so no hot key reaches any
    * shuffle. Reassembly aggregates per document (bounded by document
    * size).
    */
  def paragraphDedup(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val paras = docs
      .select(col(idCol), posexplode_outer(split(col(textCol), "\n")))
      .toDF(idCol, "pos", "para")
      .filter(col("para").isNotNull)
    val winners = paras
      .groupBy(md5(col("para")).as("__d"))
      .agg(min(struct(col(idCol).as("i"), col("pos").as("p"))).as("__w"))
      .select(col("__w.i").as(idCol), col("__w.p").as("pos"))
    val kept = paras.join(winners, Seq(idCol, "pos"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")))).as("kept_fp"))
    paras.groupBy(idCol).agg(count(lit(1)).as("n_paras"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_fp"), md5(lit(""))).as("kept_fp"))
  }

  // Portable across Java regex and RE2: explicit classes only (no \d /
  // \w shorthand, no lookaround), so a DuckDB/other-engine oracle can
  // run the identical pattern.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val numberPattern = "[0-9]+"

  /** PII/number scrub — the redaction pass before training: per-doc
    * match counts plus the fingerprint of the redacted text (emails →
    * <EMAIL> first, then digit runs → <NUM>). Pure map-side codegen'd
    * regex work; no shuffle at any scale. `n_numbers` counts on the
    * EMAIL-REDACTED intermediate, so every counted digit run is one
    * the <NUM> pass actually replaces — digits inside an email vanish
    * with the email, and counting them would make the count disagree
    * with the redaction the fingerprint reflects.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val deEmailed = regexp_replace(col(textCol), emailPattern, "<EMAIL>")
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(emailPattern)).cast("long").as("n_emails"),
      regexp_count(deEmailed, lit(numberPattern)).cast("long").as("n_numbers"),
      md5(regexp_replace(deEmailed, numberPattern, "<NUM>"))
        .as("redacted_fp"))
  }

  /** Deterministic train/val/test assignment — the split step of a
    * training pipeline as a pure map-side hash-range rule (≈ 90/5/5 by
    * the first 4 md5 hex digits of the id: engine-, partition- and
    * scale-independent, so the same document lands in the same split
    * on every run of every engine — no RNG state, no seed coordination
    * across executors). Emits per-(stratum, split) counts.
    */
  def splitAssign(docs: DataFrame, idCol: String,
      byCol: String): DataFrame = {
    docs.select(col(byCol), splitOf(idHash4(idCol)).as("split"))
      .groupBy(byCol, "split").agg(count(lit(1)).as("n_docs"))
  }

  /** Sequence packing — GPT-style concat-and-chunk assembly planned as
    * a cumulative token sum: per stratum, documents in id order fill a
    * fixed token budget; a document belongs to the bin where it STARTS
    * (floor(preceding-tokens / budget)), matching concatenation with
    * spillover. The running sum is the two-level scheme
    * ([[graft.Ranking.twoLevelPrefixSum]]): docs bucket by an
    * order-consistent coarsening of the id (256 equi-width range bins
    * for numeric ids — one bounded 1-row min/max agg — or the 2-char
    * prefix for strings), per-(stratum, bucket) token sums prefix-sum
    * on the histogram frame only, and the broadcast exclusive offsets
    * add to a parallel within-bucket cumsum. No per-stratum
    * single-partition window anywhere — a 10¹¹-doc corpus with 20
    * language strata packs without a single-task funnel. Emits
    * per-(stratum, bin) doc/token counts.
    */
  /** Monotone id → `__bkt` coarsening shared by [[packSequences]] and
    * [[budgetFill]] (Ranking contract: all rows of a lesser bucket
    * sort before all rows of a greater one). Numeric ids map to 256
    * equi-width range bins anchored by an IN-PLAN broadcast 1-row
    * min/max aggregate (the Stats rewrite: no driver-side probe job at
    * plan-construction time); string ids to their 2-char prefix. Every
    * step of the numeric map — subtract, divide by positive, floor,
    * clamp — is monotone under IEEE, so bucket order is exact.
    * `level`, when present, is a small-int LEADING order key (e.g. a
    * quality band) composed in front of the id bin so bucket order
    * follows (level, id). A NULL id sorts FIRST within its level on
    * both paths (slot 0 numeric / empty-prefix string — matching the
    * nulls-first order the ranking window uses for the id tie-break);
    * before round 9 it produced a NULL bucket that sorted ahead of
    * EVERY level, letting a worst-level null-id doc jump the
    * quality-descending fill.
    */
  private[text] def idRangeBucket(base: DataFrame, idCol: String,
      numericId: Boolean, level: Option[Column] = None): DataFrame =
    if (!numericId) {
      val pfx = coalesce(substring(col(idCol).cast("string"), 1, 2),
        lit(""))
      base.withColumn("__bkt",
        level.map(l => concat(l.cast("string"), pfx)).getOrElse(pfx))
    } else {
      val mm = broadcast(base.agg(
        min(col(idCol)).cast("double").as("__idmn"),
        max(col(idCol)).cast("double").as("__idmx")))
      // 257 slots per level: slot 0 = null id, slots 1..256 = the 256
      // range bins. The null case must be EXPLICIT: Spark's least()
      // SKIPS nulls, so a null id propagating through floor() would
      // yield least(null, 255) = 255 → bin 256, silently sorting null
      // ids LAST and sharing a slot with the max-id bin (the pre-r10
      // bug — a coalesce fallback after least() is dead code). An
      // all-null frame also lands every row in slot 0 via this branch,
      // before the null __idmn could reach the arithmetic.
      val bin = when(col(idCol).isNull, lit(0)).otherwise(
        least(floor((col(idCol).cast("double") - col("__idmn")) /
            greatest(col("__idmx") - col("__idmn"), lit(1.0)) * 256),
          lit(255)).cast("int") + 1)
      base.crossJoin(mm)
        .withColumn("__bkt", level.map(_ * 257 + bin).getOrElse(bin))
        .drop("__idmn", "__idmx")
    }

  def packSequences(docs: DataFrame, idCol: String, byCol: String,
      textCol: String, budget: Int = 2048): DataFrame = {
    // Null text excluded like budgetFill: under non-ANSI legacy
    // sizeOfNull, size(tokens(null)) = -1 — a null doc would subtract
    // a token from the running sum and shift every later bin.
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(byCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val numericId = docs.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bucketed = idRangeBucket(base, idCol, numericId)
    graft.Ranking.twoLevelPrefixSum(bucketed, partCols = Seq(byCol),
        bucketCol = "__bkt", bucketAsc = true, tieCols = Seq(idCol),
        valCol = "n_tokens", out = "__pre")
      .withColumn("bin", floor(col("__pre") / budget))
      .groupBy(byCol, "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
  }

  /** Temperature-based mixture re-weighting over a stratum column (the
    * multilingual/multi-source mixing rule of mT5/XLM-R: sample
    * proportional to p^alpha, alpha < 1 flattens the distribution so
    * tail strata are up-weighted). Since w_i = p_i^a / sum p_j^a =
    * n_i^a / sum n_j^a, the weights need only the per-stratum counts.
    * `sampling_rate` = w_i * N / n_i is the per-document acceptance
    * (or replication, when > 1) rate realizing the mix at unchanged
    * corpus size. One stratum-count aggregation, then a broadcast of
    * the one-row normalizer — nothing corpus-sized moves.
    */
  def temperatureMix(docs: DataFrame, byCol: String,
      alpha: Double = 0.5): DataFrame = {
    // alpha = 0.5 (the common default) goes through sqrt, not pow: IEEE
    // sqrt is correctly rounded on every platform, while pow(x, 0.5) is
    // only 1-ulp-accurate and may disagree in the last bit between
    // libm implementations — an oracle run on a different engine must
    // reproduce the doubles exactly.
    def powA(c: Column): Column =
      if (alpha == 0.5) sqrt(c.cast("double"))
      else pow(c.cast("double"), alpha)
    val bySrc = docs.groupBy(byCol).agg(count(lit(1)).as("n_docs"))
    val norm = bySrc.agg(
      sum(col("n_docs")).as("n_total"),
      sum(powA(col("n_docs"))).as("z"))
    bySrc.crossJoin(broadcast(norm))
      .select(col(byCol), col("n_docs"),
        round(col("n_docs") / col("n_total").cast("double"), 4).as("p"),
        round(powA(col("n_docs")) / col("z"), 4).as("weight"),
        round(powA(col("n_docs")) / col("z") *
          col("n_total") / col("n_docs"), 4).as("sampling_rate"))
  }
}
