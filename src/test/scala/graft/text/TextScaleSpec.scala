package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale rehearsal for the text-dedup family (the ClaimsScaleSpec
  * analog): a 20k-doc corpus with planted duplicate structure — exact
  * clones, single-word near-dups, and unrelated filler — must dedup
  * correctly through the exact, MinHash, and SimHash kernels without
  * the pair search degenerating (hot buckets, driver funnels, or
  * quadratic explode were each regressions caught late in earlier
  * rounds at exactly this corpus shape).
  */
class TextScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lumen", "merit", "nadir",
    "oriel", "pivot", "quark", "rhymes", "sigil", "tenor", "umbra")

  /** 20k docs: 2k base texts × (1 original + 4 exact clones +
    * 4 one-word variants) + 2k singletons.
    */
  private lazy val docs = {
    import spark.implicits._
    val rows = (0 until 2000).flatMap { b =>
      // token 0 is group-unique so base texts cannot collide across
      // groups; the variant changes one of the 29 shared-pattern tokens
      val toks = ("g" + b) +:
        (1 until 30).map(j => words((b * 7 + j * 3) % words.size) + "x" + b)
      val base = toks.mkString(" ")
      val variant = toks.updated(1 + (b % 29), "changed" + b).mkString(" ")
      val group = (0 until 5).map(c => (b * 10L + c, base)) ++
        (5 until 9).map(c => (b * 10L + c, variant))
      group :+ (b * 10L + 9, s"singleton text number $b with unique content ${b * 31}")
    }
    rows.toDF("doc_id", "text")
  }

  test("exact dedup finds every planted clone group at 20k docs") {
    val g = DedupJobs.exactDupGroups(docs, "doc_id", "text")
      .filter(col("n_docs") > 1)
    // 2000 groups of 5 exact clones + 2000 groups of 4 variants
    assert(g.count() == 4000)
    assert(g.agg(sum(col("n_docs"))).collect()(0).getLong(0) == 2000L * 9)
  }

  test("minhash links clones and one-word variants, not singletons") {
    val groups = DedupJobs.minhashDupGroups(docs, "doc_id", "text",
      cacheKey = Some("textscale"))
    val linked = groups.filter(col("dup_group") === (col("doc_id") - pmod(col("doc_id"), lit(10))))
    // exact clones (ids ..1-..4) share the base's SIGNATURE, so their
    // bucketing is identical and linkage is deterministic
    val clonesLinked = linked.filter(pmod(col("doc_id"), lit(10)).between(1, 4)).count()
    assert(clonesLinked == 2000L * 4,
      s"every exact clone must map to its base; got $clonesLinked")
    // one-word variants sit at shingle-J ≈ 0.82, where the (k=32, b=8,
    // r=4) S-curve gives ~99% per-pair recall — assert a 97% floor,
    // not exactness (LSH recall below τ=1 is statistical by design)
    val variantsLinked = linked.filter(pmod(col("doc_id"), lit(10)).between(5, 8)).count()
    assert(variantsLinked >= (2000L * 4 * 0.97).toLong,
      s"variant linkage below the LSH recall floor: $variantsLinked / 8000")
    val singletons = groups.filter(pmod(col("doc_id"), lit(10)) === 9)
    assert(singletons.filter(col("n_candidates") > 0).count() == 0,
      "singleton docs must have no verified near-dup candidates")
  }

  test("simhash pair search stays bounded and finds the exact clones") {
    val sigs = docs
      .select(col("doc_id"), TextFunctions.simhash64(col("text")).as("simhash"))
    val pairs = DedupJobs.simhashNearDupsOf(sigs,
      maxHamming = 3, maxBucket = 200, blocks = 4, comboSize = 1)
    // identical texts have hamming 0; each clone group of 5 yields
    // C(5,2) = 10 pairs (under the cap or via star degradation ≥ 4)
    val zeroDist = pairs.filter(col("hamming") === 0).count()
    assert(zeroDist >= 2000L * 4, s"clone pairs missing: $zeroDist")
  }

  test("sorted-neighborhood finds every planted clone pair at 20k docs") {
    // Clones share the full text, hence the 32-char header; identical
    // headers sort contiguously with doc_id tie-break, so all C(5,2)
    // pairs of each clone group sit within the w=10 window at dist 0.
    val pairs = DedupJobs.sortedNeighborPairs(docs, "doc_id", "text")
    val intraClone = pairs.filter(col("dist") === 0 &&
      floor(col("id_a") / 10) === floor(col("id_b") / 10) &&
      col("id_a") % 10 < 5 && col("id_b") % 10 < 5)
    assert(intraClone.count() == 2000L * 10)
  }

  test("duplicated spans at 20k docs: clones fully covered, singletons clean") {
    val spans = CurationOps.dupSpans(docs, "doc_id", "text")
    // Singleton texts embed a group-unique token in every 5-gram.
    assert(spans.filter(col("doc_id") % 10 === 9 &&
      col("n_dup") =!= 0).count() == 0)
    // Exact clones (5 copies) are duplicated at every gram position.
    assert(spans.filter(col("doc_id") % 10 < 5 &&
      col("n_dup") =!= col("n_grams")).count() == 0)
  }

  test("duplicated spans survive one gram planted in 25% of 20k docs") {
    import spark.implicits._
    // The Zipfian-boilerplate rehearsal: one 5-gram occurs in 5,000 of
    // 20k docs. Under the old count-over-window shape every occurrence
    // of the hot gram landed in ONE task; the groupBy+join shape
    // partial-aggregates it map-side, so this must complete without a
    // hot-key funnel and count the planted position in every carrier.
    val hot = "boiler plate legal footer text"
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(" " + hot)))
        .otherwise(col("text")).as("text"))
    val spans = CurationOps.dupSpans(planted, "doc_id", "text")
    // Every planted doc's FINAL gram position is the pure hot gram —
    // duplicated across all 5,000 carriers.
    val carriers = spans.filter(col("doc_id") % 4 === 0)
    assert(carriers.count() == 5000)
    assert(carriers.filter(col("n_dup") === 0).count() == 0,
      "a hot-gram carrier reported zero duplicated positions")
    // Singletons that did NOT get the hot gram stay clean.
    assert(spans.filter(col("doc_id") % 10 === 9 &&
      col("doc_id") % 4 =!= 0 && col("n_dup") =!= 0).count() == 0)
  }

  test("char spans at 20k docs: clones fully covered, hot suffix absorbed") {
    import spark.implicits._
    // Same Zipfian rehearsal at char granularity: a 40-char boilerplate
    // suffix planted on every 4th doc (5,000 carriers) must
    // partial-aggregate map-side through the hashed-gram groupBy, and
    // exact clones must be covered at every char window.
    val hot = " BOILERPLATE-LEGAL-FOOTER-0123456789ABC"
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(hot)))
        .otherwise(col("text")).as("text"))
    val spans = CurationOps.dupSpansChars(planted, "doc_id", "text")
    val carriers = spans.filter(col("doc_id") % 4 === 0)
    assert(carriers.count() == 5000)
    assert(carriers.filter(col("n_dup") === 0).count() == 0,
      "a hot-suffix carrier reported zero duplicated char windows")
    // Non-carrier exact clones (suffix-free, ≥3 identical copies per
    // group): every char window duplicated. Carriers can own a unique
    // base→suffix boundary window when they are their group's only
    // carrier, so they are asserted above via n_dup > 0 only.
    assert(spans.filter(col("doc_id") % 10 < 5 &&
      col("doc_id") % 4 =!= 0 &&
      col("n_dup") =!= col("n_grams")).count() == 0)
    // Coverage (the cut report) agrees: those clones are 100% covered.
    val cut = CurationOps.spanCut(planted, "doc_id", "text")
    assert(cut.filter(col("doc_id") % 10 < 5 &&
      col("doc_id") % 4 =!= 0 &&
      col("covered_chars") =!= col("n_chars")).count() == 0)
  }

  test("materialize=false span recompute path matches at 20k docs with a hot gram") {
    import spark.implicits._
    // The recompute path (no checkpoint, gram generation re-executed on
    // each join side) rehearsed at the same 20k-doc Zipfian shape as
    // the materialized path: identical totals, no hot-key funnel, and
    // no optimizer surprise (InferFiltersFromGenerate-class rewrites)
    // on the duplicated generate subtree.
    val hot = "boiler plate legal footer text"
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(" " + hot)))
        .otherwise(col("text")).as("text"))
    val mat = CurationOps.dupSpans(planted, "doc_id", "text")
      .agg(sum("n_dup"), sum("max_run"), sum("n_grams")).collect()(0).toSeq
    val rec = CurationOps.dupSpans(planted, "doc_id", "text",
        materialize = false)
      .agg(sum("n_dup"), sum("max_run"), sum("n_grams")).collect()(0).toSeq
    assert(mat == rec, s"recompute path diverged: $mat vs $rec")
    val cutMat = CurationOps.spanCut(planted, "doc_id", "text")
      .agg(sum("covered_chars"), sum("n_islands")).collect()(0).toSeq
    val cutRec = CurationOps.spanCut(planted, "doc_id", "text",
        materialize = false)
      .agg(sum("covered_chars"), sum("n_islands")).collect()(0).toSeq
    assert(cutMat == cutRec, s"spanCut recompute diverged: $cutMat vs $cutRec")
  }

  test("ngram pair search survives one bigram planted in 50% of 20k docs") {
    import spark.implicits._
    // The Zipfian rehearsal for the prefix-filtered Jaccard self-join
    // (the spans kernels have theirs above): a two-token boilerplate
    // suffix rides on HALF the corpus, so its bigram's inverted list
    // is 10k docs — 5·10⁷ candidate pairs if it ever entered a prefix.
    // The rare-first common-gram demotion must keep it out of every
    // prefix, leaving exactly the 200 planted identical pairs (all
    // other docs share at most boilerplate grams: J = 1/31 « τ).
    val hot = " legal footer"
    val zdocs = (0 until 20000).map { i =>
      val key = if (i < 400) 1000000 + i / 2 else i
      val base = (0 until 15).map(j => s"d${key}t$j").mkString(" ")
      val text = if ((i / 2) % 2 == 0) base + hot else base
      (i.toLong, text)
    }.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val pairs = DedupJobs.ngramJaccardPairs(zdocs, "doc_id", "text",
        Seq("lang"), n = 2, threshold = 0.9,
        cacheKey = Some("textscale-zipf"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = (0 until 200).map(i => (2L * i, 2L * i + 1, 1.0)).toSet
    assert(pairs.length == 200, s"got ${pairs.length} pairs")
    assert(pairs.toSet == expected,
      s"missing=${expected -- pairs.toSet} extra=${pairs.toSet -- expected}")
  }

  test("paragraph dedup at 20k docs keeps one copy per clone group") {
    import spark.implicits._
    // Two-paragraph docs: paragraph 1 is the (clone-group) text,
    // paragraph 2 is a per-doc unique line. Exactly one copy of each
    // group's paragraph survives; every unique paragraph survives.
    val twoPara = docs.select(col("doc_id"),
      concat(col("text"), lit("\n"), concat(lit("unique-"),
        col("doc_id").cast("string"))).as("text"))
    val out = CurationOps.paragraphDedup(twoPara, "doc_id", "text")
    assert(out.count() == 20000)
    assert(out.agg(sum(col("n_paras"))).collect()(0).getLong(0) == 40000L)
    // Survivors: per group — 1 base para (of 5 clones) + 1 variant para
    // (of 4) + 1 singleton para + 10 unique lines = 13 of 20 paras.
    assert(out.agg(sum(col("n_kept"))).collect()(0).getLong(0) ==
      2000L * 13)
    // The min-id doc of each clone set keeps both paragraphs.
    assert(out.filter(col("doc_id") % 10 === 0 &&
      col("n_kept") =!= 2).count() == 0)
    // Non-min clones keep only their unique line.
    assert(out.filter(col("doc_id") % 10 isin (1, 2, 3, 4))
      .filter(col("n_kept") =!= 1).count() == 0)
  }
}
