package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.text.CurationOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation entries over the `documents` table — the
  * between-kernels steps of a training-data pipeline: repetition
  * quality gates, benchmark decontamination, and temperature mixture
  * re-weighting. All three are SQL-expressible and carry full DuckDB
  * oracles.
  */
object CurationQueries extends QueryModule {

  import TextQueries.toksSql

  /** Gopher-style repetition gate at word-bigram granularity. */
  private def repetition(s: SparkSession, d: String): DataFrame =
    CurationOps.repetitionMetrics(Tables.documents(s, d), "doc_id", "text")

  /** Benchmark decontamination: docs 0–24 stand in for the held-out
    * eval suite; every other document is scored for trigram overlap
    * against the suite's union gram set.
    */
  private def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    CurationOps.contamination(
      corpus = docs.filter(col("doc_id") >= 25),
      benchmark = docs.filter(col("doc_id") < 25),
      idCol = "doc_id", textCol = "text")
  }

  /** Bloom-prefiltered decontamination over the same benchmark split —
    * emits only docs with ≥ 1 exact hit; bloom's no-false-negative
    * guarantee makes the output EQUAL the exact path, so the entry is
    * fully oracle-checked despite the sketch in the pipeline.
    */
  private def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    CurationOps.contaminationBloom(
      corpus = docs.filter(col("doc_id") >= 25),
      benchmark = docs.filter(col("doc_id") < 25),
      idCol = "doc_id", textCol = "text")
  }

  /** Per-source language-mix entropy report (see
    * [[CurationOps.sourceMix]] for the shape and parity story).
    */
  private def sourceMix(s: SparkSession, d: String): DataFrame =
    CurationOps.sourceMix(Tables.documents(s, d), "source", "lang")

  /** Deterministic per-epoch training order — the "global shuffle"
    * step that turns a curated corpus into a training sequence: for
    * each epoch, every document gets a position drawn from the total
    * order of `md5(epoch | doc_id)` (a different, reproducible
    * permutation per epoch, no RNG state, identical on every engine).
    * The rank is [[graft.Ranking.twoLevelRank]] partitioned per epoch
    * and bucketed by the hash's first two hex chars (histogram ≤ 256
    * per epoch) — no single-partition window, no sort of the corpus.
    */
  private def trainOrder(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.documents(s, d).select(col("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(1))).as("epoch"))
      .withColumn("__key",
        md5(concat_ws("|", col("epoch"), col("doc_id"))))
      .withColumn("__bkt", substring(col("__key"), 1, 2))
    graft.Ranking.twoLevelRank(keyed, partCols = Seq("epoch"),
        bucketCol = "__bkt", bucketAsc = true,
        tieCols = Seq("__key", "doc_id"), out = "position")
      .select(col("epoch"), col("doc_id"), col("position"))
  }

  /** The composed curation pipeline as one plan
    * ([[CurationOps.trainManifest]]).
    */
  private def trainManifest(s: SparkSession, d: String): DataFrame =
    CurationOps.trainManifest(Tables.documents(s, d), "doc_id", "text")

  /** Exact duplicated-substring spans at 5-gram granularity. */
  private def dedupSpans(s: SparkSession, d: String): DataFrame =
    CurationOps.dupSpans(Tables.documents(s, d), "doc_id", "text")

  /** Char-level ExactSubstr spans: duplicated runs of ≥ 30 characters
    * ([[CurationOps.dupSpansChars]]).
    */
  private def dedupSpansChar(s: SparkSession, d: String): DataFrame =
    CurationOps.dupSpansChars(Tables.documents(s, d), "doc_id", "text")

  /** The span-cut APPLY step: per-doc union of characters covered by
    * duplicated 30-char windows ([[CurationOps.spanCut]]).
    */
  private def dedupSpansCut(s: SparkSession, d: String): DataFrame =
    CurationOps.spanCut(Tables.documents(s, d), "doc_id", "text")

  /** Global paragraph-level keep-first dedup with per-doc reassembly
    * fingerprint ([[CurationOps.paragraphDedup]]). The synthetic corpus
    * has no newlines, so each document is one paragraph and the entry
    * degenerates to document keep-first (duplicate texts exist at
    * sf0.1; sf0.01 happens to be all-unique — the winner/reassembly
    * path still runs end-to-end). Multi-paragraph and in-doc-duplicate
    * cases are CurationSpec- and TextScaleSpec-driven.
    */
  private def dedupParagraph(s: SparkSession, d: String): DataFrame =
    CurationOps.paragraphDedup(Tables.documents(s, d), "doc_id", "text")

  /** Quality-ranked token-budget fill per language
    * ([[CurationOps.budgetFill]], budget 2,000 tokens per stratum —
    * sized to bite at sf0.01's ~5k tokens per language).
    */
  private def budgetFill(s: SparkSession, d: String): DataFrame =
    CurationOps.budgetFill(Tables.documents(s, d), "doc_id", "lang", "text")

  /** KS distribution drift per source vs the rest of the corpus
    * ([[CurationOps.sourceDrift]]).
    */
  private def sourceDrift(s: SparkSession, d: String): DataFrame =
    CurationOps.sourceDrift(Tables.documents(s, d), "source", "text")

  /** The temperature mix APPLIED as a per-doc sampling manifest
    * ([[CurationOps.mixApply]]).
    */
  private def mixApply(s: SparkSession, d: String): DataFrame =
    CurationOps.mixApply(Tables.documents(s, d), "source", "doc_id")

  /** mT5-style temperature mix over the `source` column, alpha=0.5. */
  private def mixTemperature(s: SparkSession, d: String): DataFrame =
    CurationOps.temperatureMix(Tables.documents(s, d), "source")

  /** PII/number redaction over documents ([[CurationOps.scrub]]). The
    * synthetic corpus is digit- and email-free, so on testdata the
    * counts are 0 and the fingerprint equals md5(text) — CurationSpec
    * drives the interesting cases; the oracle still hash-checks the
    * full per-document output.
    */
  private def textScrub(s: SparkSession, d: String): DataFrame =
    CurationOps.scrub(Tables.documents(s, d), "doc_id", "text")

  /** Corpus length statistics per language — the distribution summary
    * every curation report opens with: doc counts, EXACT median and p90
    * token counts, and mean tokens spelled sum/count over exact longs.
    * The percentiles run through the [[graft.Stats]] histogram kernel
    * (value histogram = distinct token counts, bounded by max document
    * size) — a per-language group is NOT bounded at corpus scale, so
    * the buffering `percentile` aggregate would hold one language's
    * every row in a single buffer. Both engines use the (n−1)·p linear
    * interpolation so the doubles agree.
    */
  private def corpusStats(s: SparkSession, d: String): DataFrame = {
    // ONE corpus pass: the (lang, n_tokens) histogram feeds counts,
    // mean, and both percentiles (weighted kernel variant) — the
    // tokenizer never re-runs per statistic.
    // three consumers (med, p90, main agg) — pin the tiny histogram
    // (langs × distinct lengths) so the tokenizing scan underneath
    // runs exactly once (policy-routed: local by default, reliable
    // under graft.checkpoint.reliable)
    // null text excluded: under legacy sizeOfNull, size(tokens(null))
    // is -1 — a REAL value that would enter the histogram and the mean
    // while the oracle's SQL aggregates skip NULLs
    val hist = graft.Checkpoint.pin(Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("lang"),
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .groupBy(col("lang"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt")),
      eager = false)
    val pct = graft.Stats.exactPercentilesByKey(hist, Seq("lang"),
      "n_tokens", Seq(0.5 -> "__med", 0.9 -> "__p90"),
      weightCol = Some("cnt"))
    val agg = hist.groupBy("lang")
      .agg(sum(col("cnt")).as("n_docs"),
        round(sum(col("n_tokens") * col("cnt")).cast("double") /
          sum(col("cnt")), 4).as("mean_tokens"))
    // left join-back keeps a lang whose docs all have EMPTY token
    // arrays (0-token histogram rows exist but may produce no
    // percentile row edge-wise), matching the oracle's GROUP BY
    graft.Stats.joinBackByKey(agg, Seq("lang"), pct)
      .select(col("lang"), col("n_docs"),
        round(col("__med"), 4).as("median_tokens"),
        round(col("__p90"), 4).as("p90_tokens"),
        col("mean_tokens"))
  }

  /** Duplication-rate report per source — the dedup yield metric
    * (exact digests; countDistinct shuffles 16-byte digests, not
    * documents).
    */
  private def dupRate(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), md5(col("text")).as("digest"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("digest")).as("n_unique"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_unique") / col("n_docs").cast("double"), 4))

  /** Document chunking — the embedding-prep step: fixed-width token
    * windows (width 128, stride 64, 50% overlap) per document, each
    * chunk fingerprinted. Pure map-side: window starts come from a
    * `sequence` per row and the slices never leave the row until the
    * explode (outer + isNotNull, as everywhere). At corpus scale this
    * is the stage that feeds the embedding model — no shuffle, chunk
    * rows stream straight to the next stage.
    */
  private def textChunk(s: SparkSession, d: String,
      width: Int = 128, stride: Int = 64): DataFrame = {
    // null text excluded: size(tokens(null)) = -1 under legacy
    // sizeOfNull, so the otherwise-branch would build
    // sequence(0, -2, stride) and throw at runtime
    val toks = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("__toks"))
    val starts = when(size(col("__toks")) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
    toks
      .select(col("doc_id"), explode_outer(transform(starts, st =>
        struct(st.as("start"),
          slice(col("__toks"), st + 1, lit(width)).as("chunk")))).as("c"))
      .filter(col("c").isNotNull)
      .select(col("doc_id"),
        col("c.start").cast("long").as("chunk_start"),
        size(col("c.chunk")).as("n_tokens"),
        md5(concat_ws(" ", col("c.chunk"))).as("chunk_fp"))
  }

  /** Train/val/test assignment over documents ([[CurationOps.splitAssign]]). */
  private def splitAssign(s: SparkSession, d: String): DataFrame =
    CurationOps.splitAssign(Tables.documents(s, d), "doc_id", "lang")

  /** Sequence packing over documents ([[CurationOps.packSequences]]). */
  private def packSequences(s: SparkSession, d: String): DataFrame =
    CurationOps.packSequences(Tables.documents(s, d), "doc_id", "lang", "text")

  /** Exactly-once DEDUP executed as a structured stream — documents
    * arrive as a file stream, `dropDuplicates` on (lang, digest) keeps
    * the first occurrence of each content digest in state, and the
    * deduped stream lands append-mode in the check sink; the final
    * per-language unique count must EQUAL the batch distinct — the
    * streaming counterpart of q_dedup_exact, behind the same oracle
    * gate as the batch entries (same harness shape as q_stream_window).
    * Unbounded corpora would bound the state with
    * `dropDuplicatesWithinWatermark` on an arrival-time column; the
    * check sink is memory-append at test scale.
    */
  private def streamDedup(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamdedup|$d") {
      val rawSchema = Tables.table(s, d, "documents").schema
      val name = "stream_dedup_" + java.lang.Integer.toHexString(d.hashCode)
      val deduped = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .select(col("lang"), md5(col("text")).as("digest"))
        // null text has a null digest: dropDuplicates would KEEP one
        // (lang, null) row that count(*) counts, while the oracle's
        // count(DISTINCT md5(text)) skips NULLs
        .filter(col("digest").isNotNull)
        .dropDuplicates("lang", "digest")
      val out = graft.streaming.BoundedStream
        .runToTable(s, deduped, name, outputMode = "append")
        .groupBy("lang").agg(count(lit(1)).as("n_unique"))
        .persist()
      out.count()
      (out, Seq(out))
    }

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_text_repetition", repetition, Some(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i+1])) AS gram
         |  FROM t WHERE len(toks) >= 2),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
         |a AS (
         |  SELECT doc_id, sum(cnt) AS n_grams, max(cnt) AS top_cnt,
         |    sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_cnt
         |  FROM c GROUP BY 1),
         |f AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
         |    round(CASE WHEN coalesce(a.n_grams, 0) > 0
         |      THEN a.top_cnt / a.n_grams::DOUBLE ELSE 0.0 END, 4)
         |      AS top_gram_frac,
         |    round(CASE WHEN coalesce(a.n_grams, 0) > 0
         |      THEN a.dup_cnt / a.n_grams::DOUBLE ELSE 0.0 END, 4)
         |      AS dup_gram_frac
         |  FROM documents d LEFT JOIN a USING (doc_id))
         |SELECT doc_id, n_grams, top_gram_frac, dup_gram_frac,
         |  (top_gram_frac <= 0.2 AND dup_gram_frac <= 0.6) AS pass_repetition
         |FROM f""".stripMargin)),
    QueryDef("q_decontaminate", decontaminate, Some(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |    ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END
         |      AS grams
         |  FROM t),
         |b AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 25),
         |e AS (SELECT doc_id, grams FROM g WHERE doc_id >= 25),
         |x AS (
         |  SELECT doc_id, count(*) AS n_hits
         |  FROM (SELECT doc_id, unnest(grams) AS gram FROM e) u
         |  JOIN b USING (gram) GROUP BY 1),
         |f AS (
         |  SELECT e.doc_id, CAST(len(e.grams) AS BIGINT) AS n_grams,
         |    CAST(coalesce(x.n_hits, 0) AS BIGINT) AS n_hits
         |  FROM e LEFT JOIN x USING (doc_id))
         |SELECT doc_id, n_grams, n_hits,
         |  round(n_hits / n_grams::DOUBLE, 4) AS contamination,
         |  round(n_hits / n_grams::DOUBLE, 4) >= 0.5 AS contaminated
         |FROM f""".stripMargin)),
    QueryDef("q_decontaminate_bloom", decontaminateBloom, Some(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |    ELSE list_distinct(list_transform(range(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END
         |      AS grams
         |  FROM t),
         |b AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 25),
         |e AS (SELECT doc_id, grams FROM g WHERE doc_id >= 25),
         |x AS (
         |  SELECT doc_id, count(*) AS n_hits
         |  FROM (SELECT doc_id, unnest(grams) AS gram FROM e) u
         |  JOIN b USING (gram) GROUP BY 1),
         |f AS (
         |  SELECT e.doc_id, CAST(len(e.grams) AS BIGINT) AS n_grams,
         |    CAST(coalesce(x.n_hits, 0) AS BIGINT) AS n_hits
         |  FROM e LEFT JOIN x USING (doc_id))
         |SELECT doc_id, n_grams, n_hits,
         |  round(n_hits / n_grams::DOUBLE, 4) AS contamination,
         |  round(n_hits / n_grams::DOUBLE, 4) >= 0.5 AS contaminated
         |FROM f WHERE n_hits > 0""".stripMargin)),
    QueryDef("q_source_mix", sourceMix, Some(
      """WITH c AS (SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
        |    count(*) AS n_langs,
        |    list({'lang': lang, 'n': n} ORDER BY lang) AS xs
        |  FROM c GROUP BY 1)
        |SELECT source, n_docs, n_langs,
        |  round(list_reduce(
        |    list_prepend(0.0, list_transform(xs,
        |      x -> -(x.n / n_docs) * ln(x.n / n_docs))),
        |    (a, b) -> a + b), 6) AS entropy
        |FROM g""".stripMargin)),
    QueryDef("q_train_manifest", trainManifest, Some(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |k AS (SELECT doc_id,
         |    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
         |  FROM t WHERE len(toks) >= 20),
         |c AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY fp),
         |s AS (SELECT doc_id,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
         |         THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
         |         THEN 'val'
         |       ELSE 'test' END AS split FROM c),
         |r AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY md5('0|' || doc_id), doc_id)
         |      AS BIGINT) AS position
         |  FROM s WHERE split = 'train')
         |SELECT s.doc_id, s.split, r.position
         |FROM s LEFT JOIN r USING (doc_id)""".stripMargin)),
    QueryDef("q_train_order", trainOrder, Some(
      """WITH e AS (SELECT doc_id, epoch
        |  FROM documents, unnest([0, 1]) AS t(epoch)),
        |k AS (SELECT doc_id, epoch,
        |  md5(epoch || '|' || doc_id) AS key FROM e)
        |SELECT epoch, doc_id,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY key, doc_id)
        |    AS BIGINT) AS position
        |FROM k""".stripMargin)),
    QueryDef("q_dedup_spans", dedupSpans, Some(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(0, len(toks) - 4),
         |      i -> array_to_string(toks[i+1:i+5], ' ')) END AS grams,
         |    CAST(greatest(len(toks) - 4, 0) AS BIGINT) AS n_grams
         |  FROM t),
         |p AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(0, len(grams)),
         |      i -> {'pos': i, 'gram': grams[i+1]})) AS u FROM g)),
         |f AS (SELECT doc_id, pos,
         |  count(*) OVER (PARTITION BY gram) AS occ FROM p),
         |i AS (SELECT doc_id, pos,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM f WHERE occ >= 2),
         |r AS (SELECT doc_id, grp, count(*) AS run FROM i GROUP BY 1, 2),
         |s AS (SELECT doc_id, sum(run) AS n_dup, max(run) AS max_run
         |  FROM r GROUP BY 1)
         |SELECT g.doc_id, g.n_grams,
         |  CAST(coalesce(s.n_dup, 0) AS BIGINT) AS n_dup,
         |  CAST(coalesce(s.max_run, 0) AS BIGINT) AS max_run,
         |  CASE WHEN g.n_grams = 0 THEN 0.0
         |    ELSE round(coalesce(s.n_dup, 0) / g.n_grams::DOUBLE, 4) END
         |    AS dup_frac
         |FROM g LEFT JOIN s USING (doc_id)""".stripMargin)),
    QueryDef("q_dedup_spans_char", dedupSpansChar, Some(
      """WITH b AS (SELECT doc_id, text, len(text) AS L FROM documents),
        |p AS (SELECT doc_id, unnest(range(0, greatest(L - 29, 0))) AS pos,
        |    text FROM b),
        |q AS (SELECT doc_id, pos, text[pos+1:pos+30] AS gram FROM p),
        |f AS (SELECT doc_id, pos,
        |  count(*) OVER (PARTITION BY gram) AS occ FROM q),
        |i AS (SELECT doc_id, pos,
        |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM f WHERE occ >= 2),
        |r AS (SELECT doc_id, grp, count(*) AS run FROM i GROUP BY 1, 2),
        |s AS (SELECT doc_id, sum(run) AS n_dup, max(run) AS max_run
        |  FROM r GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(greatest(L - 29, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(s.n_dup, 0) AS BIGINT) AS n_dup,
        |  CAST(coalesce(s.max_run, 0) AS BIGINT) AS max_run,
        |  CASE WHEN greatest(L - 29, 0) = 0 THEN 0.0
        |    ELSE round(coalesce(s.n_dup, 0) / greatest(L - 29, 0)::DOUBLE, 4)
        |    END AS dup_frac
        |FROM b LEFT JOIN s USING (doc_id)""".stripMargin)),
    QueryDef("q_dedup_spans_cut", dedupSpansCut, Some(
      """WITH b AS (SELECT doc_id, text, len(text) AS L FROM documents),
        |p AS (SELECT doc_id, unnest(range(0, greatest(L - 29, 0))) AS pos,
        |    text FROM b),
        |q AS (SELECT doc_id, pos, text[pos+1:pos+30] AS gram FROM p),
        |f AS (SELECT doc_id, pos FROM (SELECT doc_id, pos,
        |    count(*) OVER (PARTITION BY gram) AS occ FROM q)
        |  WHERE occ >= 2),
        |g AS (SELECT doc_id, pos,
        |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |    > 30 THEN 1 ELSE 0 END AS gap FROM f),
        |i AS (SELECT doc_id, pos, sum(gap) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl FROM g),
        |c AS (SELECT doc_id, isl, max(pos) - min(pos) + 30 AS covered
        |  FROM i GROUP BY 1, 2),
        |s AS (SELECT doc_id, sum(covered) AS covered,
        |    count(*) AS n_islands FROM c GROUP BY 1)
        |SELECT b.doc_id, CAST(coalesce(b.L, 0) AS BIGINT) AS n_chars,
        |  CAST(coalesce(s.covered, 0) AS BIGINT) AS covered_chars,
        |  CAST(coalesce(s.n_islands, 0) AS BIGINT) AS n_islands,
        |  CASE WHEN coalesce(b.L, 0) = 0 THEN 0.0
        |    ELSE round(coalesce(s.covered, 0) / b.L::DOUBLE, 4) END
        |    AS cut_frac
        |FROM b LEFT JOIN s USING (doc_id)""".stripMargin)),
    QueryDef("q_dedup_paragraph", dedupParagraph, Some(
      """WITH p AS (SELECT doc_id, u.pos AS pos, u.para AS para FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(ps)),
        |    i -> {'pos': i, 'para': ps[i+1]})) AS u
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ps
        |    FROM documents))),
        |w AS (SELECT doc_id, pos FROM (
        |  SELECT doc_id, pos, row_number() OVER (PARTITION BY para
        |    ORDER BY doc_id, pos) AS rn FROM p) WHERE rn = 1),
        |c AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY 1),
        |k AS (SELECT p.doc_id, count(*) AS n_kept,
        |    md5(string_agg(p.para, chr(10) ORDER BY p.pos)) AS kept_fp
        |  FROM p JOIN w USING (doc_id, pos) GROUP BY 1)
        |SELECT c.doc_id, CAST(c.n_paras AS BIGINT) AS n_paras,
        |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(k.kept_fp, md5('')) AS kept_fp
        |FROM c LEFT JOIN k USING (doc_id)""".stripMargin)),
    QueryDef("q_drift_ks", sourceDrift, Some(
      s"""WITH t AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS v
         |  FROM documents WHERE text IS NOT NULL),
         |h AS (SELECT source, v, count(*) AS n FROM t GROUP BY 1, 2),
         |g AS (SELECT v, CAST(sum(n) AS BIGINT) AS gn FROM h GROUP BY 1),
         |s AS (SELECT DISTINCT source FROM h),
         |f AS (SELECT s.source, g.v, g.gn,
         |    CAST(coalesce(h.n, 0) AS BIGINT) AS n
         |  FROM s CROSS JOIN g
         |  LEFT JOIN h ON h.source IS NOT DISTINCT FROM s.source
         |    AND h.v = g.v),
         |c AS (SELECT source, v, gn, n,
         |  sum(n) OVER (PARTITION BY source ORDER BY v
         |    ROWS UNBOUNDED PRECEDING) AS cs,
         |  sum(gn) OVER (PARTITION BY source ORDER BY v
         |    ROWS UNBOUNDED PRECEDING) AS cg
         |  FROM f),
         |tt AS (SELECT source, CAST(sum(n) AS BIGINT) AS ts
         |  FROM h GROUP BY 1),
         |tgl AS (SELECT CAST(sum(gn) AS BIGINT) AS tg FROM g)
         |SELECT c.source, tt.ts AS n_docs,
         |  round(max(CASE WHEN tgl.tg > tt.ts THEN
         |    abs(c.cs / tt.ts::DOUBLE -
         |        (c.cg - c.cs) / (tgl.tg - tt.ts)::DOUBLE)
         |    ELSE 0.0 END), 6) AS ks_stat
         |FROM c JOIN tt ON c.source IS NOT DISTINCT FROM tt.source
         |CROSS JOIN tgl
         |GROUP BY 1, 2""".stripMargin)),
    QueryDef("q_budget_fill", budgetFill, Some(
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT doc_id, lang,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CASE WHEN len(toks) > 0 THEN
         |    list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks)
         |    ELSE 0.0 END AS mtl,
         |  CASE WHEN len(text) > 0 THEN
         |    len(regexp_extract_all(text, '[[:punct:]]', 0))::DOUBLE / len(text)
         |    ELSE 0.0 END AS pr,
         |  CASE WHEN len(toks) > 0 THEN
         |    len(regexp_extract_all(lower(text),
         |      '\\b(the|and|of|to|in|is|that|for|der|die|das|und|ist|nicht|mit|ein|el|la|de|que|los|una|por|con|le|et|les|des|une|est|dans)\\b',
         |      0))::DOUBLE / len(toks) ELSE 0.0 END AS sr
         |  FROM t),
         |q AS (SELECT doc_id, lang, n_tokens,
         |  round(((CASE WHEN n_tokens >= 10 AND n_chars >= 50 THEN 1.0 ELSE 0.0 END) +
         |         (CASE WHEN mtl >= 3 AND mtl <= 10 THEN 1.0 ELSE 0.0 END) +
         |         (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END) +
         |         (CASE WHEN sr >= 0.05 THEN 1.0 ELSE 0.0 END)) / 4.0, 2)
         |    AS quality
         |  FROM c),
         |w AS (SELECT lang, n_tokens, quality,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |    ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM q)
         |SELECT lang, count(*) AS n_kept,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
         |  min(quality) AS cutoff_quality
         |FROM w WHERE pre < 2000 GROUP BY 1""".stripMargin)),
    QueryDef("q_mix_temperature", mixTemperature, Some(
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |n AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    sum(sqrt(n_docs::DOUBLE)) AS z
        |  FROM s)
        |SELECT source, n_docs,
        |  round(n_docs / n_total::DOUBLE, 4) AS p,
        |  round(sqrt(n_docs::DOUBLE) / z, 4) AS weight,
        |  round(sqrt(n_docs::DOUBLE) / z * n_total / n_docs, 4)
        |    AS sampling_rate
        |FROM s CROSS JOIN n""".stripMargin)),
    QueryDef("q_mix_apply", mixApply, Some(
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |n AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    sum(sqrt(n_docs::DOUBLE)) AS z
        |  FROM s),
        |r AS (SELECT source,
        |    round(sqrt(n_docs::DOUBLE) / z * n_total / n_docs, 4)
        |      AS sampling_rate
        |  FROM s CROSS JOIN n),
        |d AS (SELECT doc_id, source,
        |    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      AS INTEGER) AS DOUBLE) / 65536.0 AS u
        |  FROM documents)
        |SELECT d.doc_id, d.source, r.sampling_rate,
        |  CAST(floor(r.sampling_rate) +
        |    (CASE WHEN d.u < r.sampling_rate - floor(r.sampling_rate)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
        |FROM d JOIN r ON d.source IS NOT DISTINCT FROM r.source""".stripMargin)),
    QueryDef("q_text_scrub", textScrub, Some(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |    'g'), '[0-9]+', 0)) AS BIGINT)
        |    AS n_numbers,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |    'g'), '[0-9]+', '<NUM>', 'g')) AS redacted_fp
        |FROM documents""".stripMargin)),
    QueryDef("q_stream_dedup", streamDedup, Some(
      """SELECT lang, count(DISTINCT md5(text)) AS n_unique
        |FROM documents GROUP BY 1""".stripMargin)),
    QueryDef("q_split_assign", splitAssign, Some(
      """SELECT lang,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |         THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin)),
    QueryDef("q_text_chunk", (s, d) => textChunk(s, d), Some(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, len(toks), 64)) AS start
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, start AS chunk_start,
         |  CAST(len(list_slice(toks, start + 1,
         |    least(start + 128, len(toks)))) AS INTEGER) AS n_tokens,
         |  md5(array_to_string(list_slice(toks, start + 1,
         |    least(start + 128, len(toks))), ' ')) AS chunk_fp
         |FROM c""".stripMargin)),
    QueryDef("q_corpus_stats", corpusStats, Some(
      s"""WITH t AS (
         |  SELECT lang, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT lang, count(*) AS n_docs,
         |  round(quantile_cont(n_tokens, 0.5), 4) AS median_tokens,
         |  round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS mean_tokens
         |FROM t GROUP BY 1""".stripMargin)),
    QueryDef("q_dup_rate", dupRate, Some(
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_unique,
        |  round(1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE), 4)
        |    AS dup_rate
        |FROM documents GROUP BY 1""".stripMargin)),
    QueryDef("q_pack_sequences", (s, d) => packSequences(s, d), Some(
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |b AS (
         |  SELECT lang, n_tokens,
         |    CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      1 PRECEDING), 0) / 2048.0) AS BIGINT) AS bin
         |  FROM t)
         |SELECT lang, bin, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens
         |FROM b GROUP BY 1, 2""".stripMargin))
  )
}
