package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity

/** Fuzzy record linkage (blocked approximate matching) — the
  * entity-resolution counterpart of the dedup family: instead of
  * collapsing duplicates, link each record to its most similar peer.
  * The classical shape (Fellegi–Sunter style pipelines, and the
  * blocking literature they rest on) is: derive a cheap BLOCKING KEY,
  * generate candidate pairs only within a block, score candidates with
  * an edit-based similarity, and keep the best match per record.
  *
  * 100 TB posture: the all-pairs comparison is never materialized —
  * candidates come from an equi-join on the block key (a plain shuffle
  * join whose per-block fan-out is bounded by the key's construction,
  * the same discipline as the LSH band buckets in DedupJobs), the
  * scoring expression is a codegen'd kernel over the candidate frame,
  * and best-match-per-record is a map-side partial `min` over ONE
  * PACKED LONG — (ordering value << 48) | candidate id, whose natural
  * order IS the (score, tie-break id) order — so the aggregate stays
  * in hash-aggregate codegen (a `min(struct)` forces Sort +
  * SortAggregate over every candidate pair: measured 3× slower at
  * sf0.1) and the shuffle carries one long per record per map task,
  * never the candidate set. At corpus scale the block key gets finer
  * (brand → brand × soundex × length bucket); the plan shape is
  * unchanged.
  */
object LinkageQueries extends QueryModule {

  /** Nearest same-block document by edit distance on a 40-char
    * normalized prefix — fuzzy near-dup LINKING over the documents
    * table (which plants mutated near-duplicates by construction).
    * Block key = (lang, first whitespace token); candidates outside
    * the block are unseen BY DESIGN (blocking trades recall for the
    * candidate bound — the oracle mirrors the same candidate set).
    * Byte-based `levenshtein` parity with the oracle holds because the
    * corpus is ASCII (StringSimilarity scaladoc).
    */
  private def linkageNearest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        split_part(col("text"), lit(" "), lit(1)).as("fw"),
        lower(substring(col("text"), 1, 40)).as("k"))
    // Spread the pair-generation side across the cluster: the record
    // table arrives as ONE small file → one scan partition, and the
    // broadcast join would then score every blocked candidate pair in
    // a single task (measured 4.4 s single-core at sf0.1 vs sub-second
    // spread). The partition count is EXPLICIT because AQE coalesces a
    // 20k-row exchange back to one partition — it sizes on the rows
    // flowing through the shuffle, blind to the O(block²) fan-out the
    // join creates above it. At real scale the scan has many splits
    // anyway; this guards the small-input shape.
    val a = docs.toDF("doc_id", "lang", "fw", "k")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val b = docs.toDF("match_id", "lang_b", "fw_b", "k_b")
    a.join(b, col("lang") === col("lang_b") && col("fw") === col("fw_b") &&
        col("doc_id") =!= col("match_id"))
      // (dist << 48) | match_id: dist ≤ 40 (the prefix length) and ids
      // fit 48 bits with room to sf100k, so long order ≡ (dist ASC,
      // match_id ASC) — the argmin stays a hash-aggregable min(long).
      .select(col("doc_id"),
        (shiftleft(levenshtein(col("k"), col("k_b")).cast("long"), 48) +
          col("match_id")).as("packed"))
      .groupBy(col("doc_id"))
      .agg(min(col("packed")).as("best"))
      .select(col("doc_id"),
        col("best").bitwiseAND(lit((1L << 48) - 1)).as("match_id"),
        shiftright(col("best"), 48).cast("int").as("dist"))
      .orderBy(col("doc_id"))
  }

  /** Best same-brand part by Jaro-Winkler name similarity — the
    * structured-attribute linkage shape (block on an exact attribute,
    * score the name field). Scores are rounded to 4 decimals BEFORE
    * the argmax so the tie-break ordering compares the same values the
    * output carries (raw last-bit differences across engines could
    * otherwise flip the argmax). The rounding computes the integer
    * ten-thousandths DIRECTLY as `floor(score·10⁴ + 0.5)` — the oracle
    * engine's own round formula for non-negative doubles, and free of
    * the per-pair BigDecimal allocations Spark's `round` pays (two
    * `round` calls over the 16M-pair frame measured ~2 s of the
    * entry's cost at sf0.1). k is inverted so that min ≡ (score DESC,
    * key ASC) and packed with the key into the hash-aggregable long;
    * the output `k / 10000.0` is the SAME double the oracle's
    * `round(x, 4)` yields (both are the closest double to k·10⁻⁴).
    */
  private def fuzzyJaro(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    // Same single-file guard as linkageNearest (explicit count, or AQE
    // re-coalesces the tiny exchange): without it the whole 16M-pair
    // scoring loop at sf0.1 runs in one task.
    val a = p.toDF("p_partkey", "brand", "name_a")
      .repartition(s.sparkContext.defaultParallelism, col("p_partkey"))
    val b = p.toDF("match_key", "brand_b", "name_b")
    val kTenK = (StringSimilarity.jaro_winkler(col("name_a"), col("name_b")) *
      10000 + 0.5).cast("long")
    val inv = lit(10000L) - kTenK
    a.join(b, col("brand") === col("brand_b") &&
        col("p_partkey") =!= col("match_key"))
      .select(col("p_partkey"),
        (shiftleft(inv, 48) + col("match_key")).as("packed"))
      .groupBy(col("p_partkey"))
      .agg(min(col("packed")).as("best"))
      .select(col("p_partkey"),
        ((lit(10000L) - shiftright(col("best"), 48)) / 10000.0).as("score"),
        col("best").bitwiseAND(lit((1L << 48) - 1)).as("match_key"))
      .orderBy(col("p_partkey"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_linkage_nearest", linkageNearest, Some(
      """WITH d AS (SELECT doc_id, lang, split_part(text, ' ', 1) AS fw,
        |  lower(substr(text, 1, 40)) AS k FROM documents),
        |c AS (SELECT a.doc_id, b.doc_id AS match_id,
        |        levenshtein(a.k, b.k) AS dist
        |      FROM d a JOIN d b ON a.lang = b.lang AND a.fw = b.fw
        |        AND a.doc_id <> b.doc_id)
        |SELECT doc_id, match_id, dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY dist, match_id) AS rn FROM c)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),
    QueryDef("q_fuzzy_jaro", fuzzyJaro, Some(
      """WITH p AS (SELECT p_partkey, p_brand, p_name FROM part),
        |c AS (SELECT a.p_partkey, b.p_partkey AS match_key,
        |        round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS score
        |      FROM p a JOIN p b ON a.p_brand = b.p_brand
        |        AND a.p_partkey <> b.p_partkey)
        |SELECT p_partkey, score, match_key FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_partkey
        |    ORDER BY score DESC, match_key) AS rn FROM c)
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin))
  )
}
