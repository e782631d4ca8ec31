package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline
  * operators (dedup, quality, language-ID, fingerprinting). The scan
  * paths compose built-in codegen'd functions wherever one fits; the
  * exceptions are the tight-loop signature kernels (minhash, simhash,
  * winnowing), where the higher-order-function formulation is
  * interpreted per element and each UDF carries its measured
  * justification.
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Distinct token set (order-stable via sort). */
  def tokenSet(text: Column): Column = array_sort(array_distinct(tokens(text)))

  /** Word n-gram shingles from a MATERIALIZED token-array column.
    * Callers must project `tokens(text)` into a real column first —
    * passing `tokens(text)` inline would re-tokenize the text at every
    * lambda position (Catalyst inlines subexpressions into higher-order
    * functions; measured ~60× re-evaluation per row).
    */
  def shinglesOf(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** Convenience form over raw text — only for small inputs/tests; hot
    * paths project tokens first and use `shinglesOf`.
    */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Word n-grams WITH multiplicity (no distinct, no short-input
    * fallback — fewer than n tokens yields an empty array): the
    * repetition statistics need occurrence counts, which the
    * set-semantic [[shinglesOf]] erases. Same materialized-tokens
    * contract as `shinglesOf`. `sep` joins the gram's tokens (the
    * behavioral-path entry renders "a > b > c").
    */
  def gramsOf(toks: Column, n: Int, sep: String = " "): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(sep, slice(toks, i + 1, lit(n)))))

  /** 64-bit string hash for the signature kernels (two 32-bit murmurs
    * combined — LSH-quality, not cryptographic).
    */
  private[text] def hash64(s: String): Long =
    (scala.util.hashing.MurmurHash3.stringHash(s).toLong << 32) |
      (scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong & 0xFFFFFFFFL)

  /** splitmix64 finalizer — the per-permutation mixer. */
  private[text] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: k permutations via one base hash per shingle +
    * k splitmix64 variants (Broder-style minwise hashing with the
    * standard one-hash/k-mix construction). Tight-loop UDF: the
    * higher-order-function formulation (k nested transforms) is
    * interpreted per element and measured ~100× slower at corpus scan
    * scale. Returns array<long> of length k.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column = {
    val f = udf { shingles: Seq[String] =>
      val sig = Array.fill(k)(Long.MaxValue)
      shingles.foreach { s =>
        val base = hash64(s)
        var i = 0
        while (i < k) {
          val h = mix64(base + i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      sig
    }
    f(shingleCol)
  }

  /** LSH band hashes: signature split into `bands` bands of
    * `k/bands` rows; each band hashed to one bucket key. Returns
    * array<struct<band:int, bucket:long>>.
    */
  def bandHashes(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.cast("int").as("band"),
        xxhash64(slice(sig, b * rows + 1, lit(rows))).as("bucket")))
  }

  /** Exact Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** 64-bit SimHash over the token multiset: for each bit, sum +1/-1
    * weighted by token occurrences, take the sign. Charikar '02.
    * Null text → null signature (the UDF underneath dereferences the
    * token array; reference-typed UDF args are NOT null-shielded, so
    * the guard lives here).
    */
  def simhash64(text: Column): Column =
    when(text.isNull, lit(null).cast("long"))
      .otherwise(simhash64Of(tokens(text)))

  /** SimHash over a materialized token-array column: per-bit signed
    * votes over the 64-bit token hashes, sign → bit (Charikar '02).
    * Tight-loop UDF for the same reason as `minhashSignature`.
    */
  def simhash64Of(toks: Column): Column = {
    val f = udf { tokens: Seq[String] =>
      val votes = Array.fill(64)(0)
      tokens.foreach { t =>
        val h = hash64(t)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      var out = 0L
      var bit = 0
      while (bit < 64) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      out
    }
    f(toks)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Canonical document fingerprint: md5 of the sorted distinct token
    * set — stable under word reordering and duplication (the
    * SQL-checkable set-level fingerprint).
    */
  def fingerprint(text: Column): Column =
    // null-guarded: concat_ws never returns null, so without the guard
    // a null-text doc fingerprinted as md5("") — conflated with every
    // whitespace-only doc (and diverging from a SQL engine's NULL).
    // Null content is unknown, not identical (the exactDupGroups
    // convention); it gets a null fingerprint.
    when(text.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(" ", tokenSet(text))))

  /** Winnowing fingerprints (Schleimer et al. '03, the MOSS local
    * document-fingerprinting algorithm): polynomial rolling hash over
    * token `window`-grams, then the minimum hash of each `winnow`-sized
    * window of those — guarantees any shared run of ≥ winnow+window−1
    * tokens yields a shared fingerprint. Returns the distinct selected
    * hashes, sorted. Tight-loop UDF over a materialized token column.
    */
  def winnowFingerprints(toks: Column, window: Int = 4, winnow: Int = 4): Column = {
    val f = udf { tokens: Seq[String] =>
      val th = tokens.map(hash64).toArray
      val n = th.length
      if (n == 0) Array.empty[Long]
      else {
        val grams =
          if (n < window) Array(th.foldLeft(1125899906842597L)((a, b) => mix64(a ^ b)))
          else Array.tabulate(n - window + 1) { i =>
            var h = 1125899906842597L
            var j = i
            while (j < i + window) { h = mix64(h ^ th(j)); j += 1 }
            h
          }
        winnowSelect(grams, winnow)
      }
    }
    f(toks)
  }

  /** Incremental Schleimer et al. §4 selection, generic in the gram
    * type: slide a winnow-sized window ONE gram at a time; record the
    * window minimum, rightmost occurrence on ties, deduping
    * consecutive picks by position; return the distinct selected
    * values sorted. Sliding by the winnow size instead (tiling) loses
    * the guarantee that any shared run of ≥ winnow+window−1 tokens
    * yields a shared fingerprint — tiles align to absolute offsets, so
    * the same run at a different offset can select different minima.
    * Shared by the long-hash kernel and the md5-hex oracle variant so
    * the selection rule cannot diverge between them.
    */
  private def winnowSelect[T](grams: Array[T], winnow: Int)(
      implicit ord: Ordering[T], ct: scala.reflect.ClassTag[T]): Array[T] = {
    import ord.mkOrderingOps
    val selected = scala.collection.mutable.SortedSet.empty[T]
    val nw = math.min(winnow, grams.length)
    var minPos = -1
    var i = 0
    while (i + nw <= grams.length) {
      if (minPos < i) {
        // previous minimum slid out — rescan the window, rightmost min
        minPos = i
        var j = i + 1
        while (j < i + nw) { if (grams(j) <= grams(minPos)) minPos = j; j += 1 }
        selected.add(grams(minPos))
      } else {
        // only the newly entered gram can change the minimum
        val entered = i + nw - 1
        if (grams(entered) <= grams(minPos)) {
          minPos = entered
          selected.add(grams(minPos))
        }
      }
      i += 1
    }
    selected.toArray
  }

  /** DuckDB-replicable winnowing: gram hash = md5 hex of the
    * space-joined token window (computable identically by any SQL
    * engine), selection rule shared with the fast kernel
    * ([[winnowSelect]]). The long-hash kernel stays the scale default
    * — 8-byte gram keys beat 32-char hex strings through the shuffle —
    * but this variant makes the q_text_winnow entry oracle-green: the
    * DuckDB oracle re-derives the full window-minimum selection from
    * raw text, a genuine cross-engine check of the winnowing rule.
    */
  def winnowFingerprintsHex(toks: Column, window: Int = 4,
      winnow: Int = 4): Column = {
    val hexDigits = "0123456789abcdef".toCharArray
    val f = udf { tokens: Seq[String] =>
      if (tokens == null) null
      else {
        val n = tokens.length
        if (n == 0) Array.empty[String]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          // Manual hex encode: a per-byte format() call here measured
          // ~7× the whole entry's long-hash runtime at sf0.1.
          def h(s: String): String = {
            val dig = md.digest(
              s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val out = new Array[Char](32)
            var i = 0
            while (i < 16) {
              out(2 * i) = hexDigits((dig(i) >> 4) & 0xf)
              out(2 * i + 1) = hexDigits(dig(i) & 0xf)
              i += 1
            }
            new String(out)
          }
          val arr = tokens.toArray
          val sb = new java.lang.StringBuilder(64)
          def gram(from: Int, until: Int): String = {
            sb.setLength(0)
            var j = from
            while (j < until) {
              if (j > from) sb.append(' ')
              sb.append(arr(j))
              j += 1
            }
            sb.toString
          }
          val grams =
            if (n < window) Array(h(gram(0, n)))
            else Array.tabulate(n - window + 1)(i =>
              h(gram(i, i + window)))
          winnowSelect(grams, winnow)
        }
      }
    }
    f(toks)
  }

  /** Naive reference winnowing (audit path): recomputes the selection
    * by rescanning EVERY winnow-window from scratch — O(n·winnow),
    * rightmost minimum per window — an independent implementation of
    * the Schleimer et al. selection rule used to audit the incremental
    * kernel in [[winnowFingerprints]] (q_text_winnow_sound asserts the
    * two selections are identical on every document).
    */
  def winnowFingerprintsNaive(toks: Column, window: Int = 4, winnow: Int = 4): Column = {
    val f = udf { tokens: Seq[String] =>
      val th = tokens.map(hash64).toArray
      val n = th.length
      if (n == 0) Array.empty[Long]
      else {
        val grams =
          if (n < window) Array(th.foldLeft(1125899906842597L)((a, b) => mix64(a ^ b)))
          else (0 to n - window).map { i =>
            (i until i + window).foldLeft(1125899906842597L)((a, j) => mix64(a ^ th(j)))
          }.toArray
        val nw = math.min(winnow, grams.length)
        val selected = scala.collection.mutable.SortedSet.empty[Long]
        var i = 0
        while (i + nw <= grams.length) {
          var minPos = i
          var j = i
          while (j < i + nw) { if (grams(j) <= grams(minPos)) minPos = j; j += 1 }
          selected += grams(minPos)
          i += 1
        }
        selected.toArray
      }
    }
    f(toks)
  }

  /** Language marker lexicons (tiny, high-frequency function words) for
    * space-delimited languages. Heuristic n-gram/stopword language ID —
    * public-knowledge approach (cf. Cavnar & Trenkle '94 n-gram
    * categorization). zh is detected by CJK codepoint density instead
    * (word-boundary regexes cannot segment unspaced CJK text).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans"))

  /** CJK ideograph regex — identical syntax in Java regex and RE2, so
    * the DuckDB oracle matches byte for byte.
    */
  val cjkPattern: String = "[\\x{4e00}-\\x{9fff}]"

  /** Occurrences of any of `words` as whole tokens in `text`.
    * `regexp_count` counts matches without materializing the match
    * array (`size(regexp_extract_all(...))` allocated every match
    * string; same value, measured ~3× dearer on the corpus scan).
    */
  def markerHits(text: Column, words: Seq[String]): Column = {
    val pattern = words.mkString("\\b(", "|", ")\\b")
    regexp_count(lower(text), lit(pattern))
  }

  /** Per-language scores: marker-word hits for latin-script languages,
    * CJK codepoint count for zh.
    */
  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) => lang -> markerHits(text, words) } :+
      ("zh" -> regexp_count(text, lit(cjkPattern)))

  /** Predicted language = argmax of scores (ties → earlier language in
    * `langScores` order wins; all zero → "und"). The argmax is
    * `array_max` over (hits, -index, lang) structs — a when-chain fold
    * duplicates each branch expression at every level (the innermost
    * score was evaluated ~2⁴ times; conditional branches defeat
    * common-subexpression elimination), which made this the single
    * most expensive scan in the suite.
    */
  def langId(text: Column): Column = {
    val scored = langScores(text).zipWithIndex.map { case ((lang, hits), i) =>
      struct(hits.as("hits"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality-score components: char length, token count, mean token
    * length, punctuation ratio, stopword ratio, and a composite score
    * in [0,1] (simple interpretable heuristics in the C4/Gopher-rules
    * family).
    */
  def qualityComponents(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    // Σ token lengths as length(concat_ws("", toks)): codegen'd single
    // pass; an aggregate() lambda is interpreted per element (the
    // HOF-lambda trap — measured dominant in this scan).
    val meanTokLen = when(nToks > 0,
      length(concat_ws("", toks)).cast("double") / nToks)
      .otherwise(lit(0.0))
    val punct = regexp_count(text, lit("[\\p{Punct}]")).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val stopHits = markerHits(text, langMarkers.flatMap(_._2)).cast("double")
    val stopRatio = when(nToks > 0, stopHits / nToks).otherwise(lit(0.0))
    // composite: reward 3..10-char mean tokens, some stopwords, low punct
    val lenOk = when(nToks >= 10 && nChars >= 50, lit(1.0)).otherwise(lit(0.0))
    val tokOk = when(meanTokLen >= 3 && meanTokLen <= 10, lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopRatio >= 0.05, lit(1.0)).otherwise(lit(0.0))
    val score = (lenOk + tokOk + punctOk + stopOk) / 4.0
    struct(
      nChars.cast("long").as("n_chars"),
      nToks.cast("long").as("n_tokens"),
      round(meanTokLen, 4).as("mean_token_len"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(score, 2).as("quality_score"))
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (word pieces, digits, punctuation as separate tokens — the
    * GPT-2-style pretokenizer pattern family).
    */
  def tokenCounts(text: Column): Column =
    struct(
      size(tokens(text)).as("ws_tokens"),
      regexp_count(text,
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("re_tokens"))
}
