package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Checkpoint, QueryDef, QueryModule, Tables}
import graft.text.TextFunctions.tokens

/** Distributed BPE merge training — the TRAINING side of the tokenizer
  * surface (q_token_counts is the apply side; ref: the tokenizer-adjacent
  * text handling in check_duplication.py:21's token regexes generalized
  * to subword learning).
  *
  * Learns the first K byte-pair-encoding merges exactly as the classical
  * algorithm (Sennrich et al. 2016) defines them: iteratively, count
  * adjacent symbol pairs across the corpus weighted by word frequency,
  * merge the most frequent pair (ties broken pair-lexicographically),
  * repeat. All counting is exact-integer and the tie-break total, so the
  * K-row merge table is deterministic and DuckDB-oracle-checkable (the
  * oracle unrolls the K iterations as CTE steps).
  *
  * Scale posture (the canonical distributed BPE trainer shape):
  *
  *  - ONE corpus-sized job builds the word FREQUENCY CLASSES (distinct
  *    word → count). Every later iteration runs over that vocab frame —
  *    sublinear in corpus size (10⁶–10⁸ rows at 100 TB), never the raw
  *    corpus again. The vocab is pinned (lineage-truncated) so the scan
  *    cannot replay.
  *  - Per iteration: one hash-aggregate shuffle over (pair → Σfreq) with
  *    MAP-SIDE partial combine (the exchange carries ≤ |pair vocab| ×
  *    partitions rows), then a 1-ROW TakeOrdered to the driver — the only
  *    driver state across the loop is the K-row merge table itself.
  *  - Merge application is a narrow per-row `replace` on the wrapped
  *    symbol string (below) — no shuffle, re-planned per iteration on the
  *    pinned blocks (K narrow projections over the vocab, not K corpus
  *    scans).
  *
  * Symbol sequences are carried as a WRAPPED STRING — every symbol
  * enclosed in single spaces, `" q  u  e  r  y "` — because single-rule
  * BPE application is then exactly one non-regex `replace(s, " a  b ",
  * " ab ")`: left-to-right, non-overlapping, boundary-safe (a symbol
  * match needs its own wrapping spaces, so `" a  b "` can never match
  * inside `" xa  b "`), and IDENTICAL in Spark and DuckDB. Tokens are
  * whitespace-split so symbols can never contain the separator. The
  * fold-with-list alternative needs a per-row lambda over arrays; the
  * wrapped form keeps the hot loop in one codegen'd string primitive.
  */
object BpeQueries extends QueryModule {

  /** Number of merges learned; small enough that the DuckDB oracle can
    * unroll the iterations, large enough to cross several multi-char
    * symbol generations on the driver corpus.
    */
  private[operators] val MergeCount = 10

  /** Core trainer over a frequency-class frame with columns
    * (`w` string, `cnt` long); returns the learned merge table. Exposed
    * so specs can drive it with hand-computable corpora.
    */
  private[graft] def trainMerges(
      freqClasses: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    // Wrapped-symbol initial state = every character its own symbol.
    val words = Checkpoint.pin(freqClasses.select(
      regexp_replace(col("w"), "(.)", " $1 ").as("s"), col("cnt")))
    var vocab = words
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      // Adjacent-pair counts weighted by word frequency. Array indexing
      // in Spark SQL is 0-based; pairs (i, i+1) for i in [0, n-2].
      // Words reduced to one symbol emit no pairs (empty sequence).
      val best = vocab
        .select(split(trim(col("s")), "  ").as("sym"), col("cnt"))
        .filter(size(col("sym")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(sym) - 2)," +
            " i -> struct(sym[i] AS a, sym[i + 1] AS b))")).as("pr"),
          col("cnt"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, a, b, c))
        vocab = vocab.select(
          replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")).as("s"),
          col("cnt"))
        rank += 1
      }
    }
    merges.result()
  }

  /** Word frequency classes — the ONLY corpus-sized job on the BPE
    * path; both the trainer and the encoder run over its output.
    */
  private def freqClasses(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode_outer(tokens(col("text"))).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** The learned merge table, trained once per (session, dataset) —
    * q_bpe_merges and q_bpe_encode share it.
    */
  private def mergesFor(s: SparkSession,
      d: String): Seq[(Int, String, String, Long)] =
    graft.SessionCache.getOrBuild(s, s"bpemerges|$d") {
      (trainMerges(freqClasses(s, d), MergeCount), Seq.empty)
    }

  /** (rank, left, right, weighted pair count) for the first K merges. */
  private def bpeMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mergesFor(s, d)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** The APPLY side of the tokenizer: encode the vocabulary with the
    * learned merge table (each rule replayed in rank order — exactly
    * the trainer's own application, so train→encode round-trips) and
    * report the top-30 subword symbols by corpus frequency. This is
    * the distributed shape of BPE tokenization at 100 TB: the merge
    * table is a driver-small artifact (K rows) replayed as K narrow
    * per-row `replace`s over the frequency classes — no shuffle until
    * the final subword count aggregate, and raw text is never touched
    * after the one frequency-class job.
    */
  private def bpeEncode(s: SparkSession, d: String): DataFrame =
    subwordCounts(freqClasses(s, d), mergesFor(s, d))
      .orderBy(desc("n"), asc("subword"))
      .limit(30)

  /** Encode a (`w`, `cnt`) frequency-class frame with a merge table
    * (rules replayed in rank order) and count the resulting subword
    * symbols corpus-wide. Exposed for the round-trip spec.
    */
  private[graft] def subwordCounts(freq: DataFrame,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val words = freq
      .select(regexp_replace(col("w"), "(.)", " $1 ").as("s"), col("cnt"))
    val encoded = merges.foldLeft(words) {
      case (acc, (_, a, b, _)) =>
        acc.select(
          replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")).as("s"),
          col("cnt"))
    }
    encoded
      .select(explode(split(trim(col("s")), "  ")).as("subword"), col("cnt"))
      .groupBy("subword").agg(sum("cnt").as("n"))
  }

  /** The K iterations unrolled as CTE steps (pN = pair counts, bN = the
    * argmax row, vN = the merged vocab), exactly mirroring the Spark
    * loop; DuckDB's `replace` is the same left-to-right non-overlapping
    * primitive.
    */
  private def oraclePrefix: String = {
    val steps = (1 to MergeCount).map { k =>
      s"""p$k AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS c
         |       FROM (SELECT string_split(trim(s), '  ') AS sym, cnt FROM v${k - 1}) q,
         |            UNNEST(range(1, len(q.sym))) AS t(i)
         |       GROUP BY 1, 2),
         |b$k AS (SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
         |v$k AS (SELECT replace(s, ' '||a||'  '||b||' ', ' '||a||b||' ') AS s, cnt
         |       FROM v${k - 1}, b$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT t AS w, count(*) AS cnt FROM
       |       (SELECT unnest(${TextQueries.toksSql}) AS t FROM documents) GROUP BY 1),
       |v0 AS (SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS s, cnt FROM w),
       |$steps""".stripMargin
  }

  private def bpeOracle: String = {
    val out = (1 to MergeCount).map { k =>
      s"SELECT CAST($k AS INTEGER) AS merge_rank, a AS left_sym," +
        s" b AS right_sym, c AS pair_count FROM b$k"
    }.mkString("\nUNION ALL\n")
    s"""$oraclePrefix
       |SELECT * FROM (
       |$out
       |) ORDER BY merge_rank""".stripMargin
  }

  private def encodeOracle: String =
    s"""$oraclePrefix
       |SELECT t.sym AS subword, CAST(sum(q.cnt) AS BIGINT) AS n
       |FROM (SELECT string_split(trim(s), '  ') AS syms, cnt
       |      FROM v$MergeCount) q,
       |     UNNEST(q.syms) AS t(sym)
       |GROUP BY 1 ORDER BY n DESC, subword LIMIT 30""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q_bpe_merges", bpeMerges, Some(bpeOracle)),
    QueryDef("q_bpe_encode", bpeEncode, Some(encodeOracle))
  )
}
