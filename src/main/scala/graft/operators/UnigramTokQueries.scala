package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Checkpoint, QueryDef, QueryModule, Tables}
import graft.text.TextFunctions.tokens

/** Unigram-LM (SentencePiece-style) tokenizer training — the EM
  * counterpart to [[BpeQueries]] (Kudo 2018, reduced to ONE hard-EM
  * round): seed a piece vocabulary from substring frequencies, E-step
  * Viterbi-segment every word under the current piece model, M-step
  * recount pieces from the Viterbi segmentations. The output is the
  * vocabulary with seed count, model cost, and EM-updated count — an
  * em_count of 0 is the prune signal the next round would apply.
  *
  * ORACLE-EXACT FORMULATION (the round-15 verdict's precondition for
  * attempting this): piece probabilities are never carried as floats
  * through the DP. Each piece gets ONE fixed-point integer cost
  * `round(10⁶ · ln(T/c))` — a single libm ln + round per VOCAB row
  * (config-bounded, the same engine-parity discipline as the green
  * BM25/LM entries) — and everything after that is exact BIGINT
  * arithmetic: the Viterbi DP minimizes struct(total cost, piece
  * count, backpointer) lexicographically, which is UNIQUE at every
  * position (candidates at a position differ in their backpointer),
  * so the segmentation, the backtrack, and the EM counts are fully
  * deterministic and hash-check against DuckDB's unrolled CTEs.
  *
  * Scale posture (the BPE trainer's, improved — NO driver state at
  * all): ONE corpus-sized job builds the word frequency classes;
  * every later stage runs over that sublinear frame. Substring
  * expansion is bounded by the CONFIG constants ([[MaxWordLen]] ×
  * [[MaxPieceLen]] ≤ 48 spans per word — a config cap, not a data
  * property, so no power-law row can widen it; words over the cap
  * are excluded, documented). The vocabulary is a ≤(Σ+[[MultiVocab]])-
  * row frame BROADCAST into the span join; the DP/backtrack loops are
  * [[MaxWordLen]] bounded joins over the word frame with the pinned
  * match and DP tables each consumed by every step.
  */
object UnigramTokQueries extends QueryModule {

  /** Longest piece the seed vocabulary considers. */
  private[operators] val MaxPieceLen = 4

  /** Longest word the trainer segments; longer words are excluded
    * from training (at web scale this is the standard
    * max-sentencepiece-length guard — raise the constant, the DP
    * unroll and oracle grow linearly with it).
    */
  private[operators] val MaxWordLen = 12

  /** Multi-character vocabulary budget (every occurring single char
    * is always kept — the coverage guarantee that makes the Viterbi
    * DP total).
    */
  private[operators] val MultiVocab = 24

  /** Output rows (vocab is ≤ singles + [[MultiVocab]]; the cut keeps
    * the artifact bounded and the tie-break is total).
    */
  private val TopK = 30

  /** The shared model-fit core: filtered word classes, the costed
    * vocabulary, and the completed Viterbi DP table — everything up
    * to (but not including) the backtrack, so the trainer (which
    * backtracks to recount pieces) and the encoder (which only needs
    * each word's optimal piece COUNT at its final position) split
    * here.
    */
  private[graft] final case class EmArtifacts(
      words: DataFrame, cost: DataFrame, dp: DataFrame)

  /** One hard-EM round over a (`w`, `cnt`) frequency-class frame;
    * exposed so the spec can drive it with hand-computable corpora.
    * Returns (piece, seed_count, piece_cost, em_count).
    */
  private[graft] def trainFrame(freqRaw: DataFrame): DataFrame =
    trainFromArtifacts(emCore(freqRaw))

  private def trainFromArtifacts(art: EmArtifacts): DataFrame = {
    val (words, cost, dp) = (art.words, art.cost, art.dp)
    // Backtrack: walk each word from its end through the stored
    // backpointers, emitting one piece per step — again MaxWordLen
    // bounded joins, each against the pinned DP table.
    var cur = words.select(col("w"),
      length(col("w")).cast("int").as("pos"), col("cnt"))
    val parts = Seq.newBuilder[DataFrame]
    for (_ <- 1 to MaxWordLen) {
      // Pinned per step for the same plan-depth reason as the DP
      // rounds: every emitted piece frame hangs off `step`, and an
      // unpinned chain puts step k's whole join history under each of
      // the 12 union branches.
      val step = Checkpoint.pin(
        cur.filter(col("pos") > 0).join(dp, Seq("w", "pos"))
          .select(col("w"), col("pos"), col("bj"), col("cnt")))
      parts += step.select(
        expr("substring(w, bj + 1, pos - bj)").as("piece"), col("cnt"))
      cur = step.select(col("w"), col("bj").as("pos"), col("cnt"))
    }
    val em = parts.result().reduce(_ unionByName _)
      .groupBy("piece").agg(sum(col("cnt")).as("em"))
    cost.join(em, Seq("piece"), "left")
      .select(col("piece"), col("c").as("seed_count"),
        col("pc").as("piece_cost"),
        coalesce(col("em"), lit(0L)).as("em_count"))
      .orderBy(desc("em_count"), asc("piece"))
      .limit(TopK)
  }

  private[graft] def emCore(freqRaw: DataFrame): EmArtifacts = {
    val words = Checkpoint.pin(
      freqRaw.filter(length(col("w")) <= MaxWordLen))
    // All spans (j, i = j+l, piece): ≤ MaxWordLen × MaxPieceLen = 48
    // structs per row — config-bounded, so the nested transform is NOT
    // the d² basket hazard (the bound is a constant, not a data
    // property).
    val spans = words.select(col("w"), col("cnt"),
      explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1), j ->
           |  transform(sequence(1, least($MaxPieceLen, length(w) - j)),
           |    l -> struct(j AS j, j + l AS i,
           |      substring(w, j + 1, l) AS piece))))""".stripMargin))
        .as("sp"))
      .select(col("w"), col("cnt"), col("sp.j").as("j"),
        col("sp.i").as("i"), col("sp.piece").as("piece"))
    val seed = spans.groupBy("piece").agg(sum(col("cnt")).as("c"))
    // Vocabulary: every single char (coverage) + top multi-char
    // substrings by (count, piece) — a distributed TakeOrdered, never
    // a full sort.
    val multi = seed.filter(length(col("piece")) > 1)
      .orderBy(desc("c"), asc("piece")).limit(MultiVocab)
    val vocab = seed.filter(length(col("piece")) === 1)
      .unionByName(multi)
    val tt = vocab.agg(sum(col("c")).as("t"))
    // The ONLY non-integer step: one ln + round per vocab row, into a
    // fixed-point BIGINT cost (both engines: same double expression,
    // same positive-half-up round — the library's proven libm parity).
    val cost = Checkpoint.pin(vocab.crossJoin(broadcast(tt))
      .select(col("piece"), col("c"),
        expr("CAST(round(1000000.0 * ln(CAST(t AS DOUBLE) / c), 0)" +
          " AS BIGINT)").as("pc")))
    val matches = Checkpoint.pin(
      spans.join(broadcast(cost.select(col("piece"), col("pc"))),
        Seq("piece"))
        .select(col("w"), col("j"), col("i"), col("pc")))
    // Viterbi forward: dp(i) = min over spans (j → i) of
    // struct(dp(j).cost + pc, dp(j).np + 1, j) — lexicographic BIGINT
    // min, unique per position (candidates differ in j). MaxWordLen
    // bounded iterations over the sublinear word frame.
    // Each round pins the accumulator (the tiny |words|×pos frame):
    // round i's join reads rounds 0..i-1, so an unpinned chain hands
    // Catalyst a plan whose size doubles per round — the first cut
    // spent ~3 MINUTES in the optimizer on a 31-word corpus before
    // any task ran. The pin is the BFS per-level pattern: lineage
    // truncated every round, plan depth constant.
    var dpAcc = Checkpoint.pin(words.select(col("w"), lit(0).as("pos"),
      lit(0L).as("cost"), lit(0).as("np"), lit(0).as("bj")))
    for (i <- 1 to MaxWordLen) {
      val next = matches.filter(col("i") === i)
        .join(dpAcc.select(col("w"), col("pos").as("j"),
          col("cost").as("jc"), col("np").as("jn")), Seq("w", "j"))
        .groupBy("w")
        .agg(min(struct((col("jc") + col("pc")).as("cost"),
          (col("jn") + 1).as("np"), col("j").as("bj"))).as("m"))
        .select(col("w"), lit(i).as("pos"), col("m.cost").as("cost"),
          col("m.np").as("np"), col("m.bj").as("bj"))
      dpAcc = Checkpoint.pin(dpAcc.unionByName(next))
    }
    EmArtifacts(words, cost, dpAcc)
  }

  /** ENCODE with the trained model (the apply counterpart, mirroring
    * the BPE train/encode pair): fit the unigram LM on the corpus's
    * own frequency classes, then label every document with its
    * tokenization stats — scorable word count, total optimal piece
    * count, characters covered, and words skipped by the length cap.
    * The per-word piece count is the DP's `np` at the word's final
    * position (no backtrack needed — the count rides the struct-min),
    * so encoding is a |distinct words|-row join back onto the token
    * stream: the corpus is touched exactly twice (frequency classes +
    * the final per-doc fold), everything between is sublinear. The
    * compression signal (n_pieces / n_words) is the
    * tokenizer-fertility quality gate a curation pipeline thresholds
    * on.
    */
  private[graft] def encodeFrame(toksRaw: DataFrame): DataFrame = {
    // The token stream feeds the frequency classes AND the per-doc
    // fold — pin once, read blocks twice.
    val tk = Checkpoint.pin(toksRaw)
    encodeFromArtifacts(emCore(
      tk.groupBy("w").agg(count(lit(1)).as("cnt"))), tk)
  }

  private def encodeFromArtifacts(art: EmArtifacts,
      tk: DataFrame): DataFrame = {
    val wp = art.dp
      .join(art.words.select(col("w"),
        length(col("w")).cast("int").as("wl")), Seq("w"))
      .filter(col("pos") === col("wl"))
      .select(col("w"), col("np").cast("long").as("np"))
    tk.join(wp, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(col("np")).as("n_words"),
        coalesce(sum(col("np")), lit(0L)).as("n_pieces"),
        coalesce(sum(when(col("np").isNotNull,
          length(col("w")).cast("long"))), lit(0L)).as("n_chars"),
        sum(when(col("np").isNull, 1L).otherwise(0L)).as("n_skipped"))
      .orderBy("doc_id")
  }

  /** The corpus-fitted model, session-cached (the coEdges precedent):
    * a tokenizer is trained ONCE per corpus and then applied — the
    * train and encode entries share the fitted artifacts instead of
    * each paying the frequency-class job and the 12-round DP. The
    * word frequency classes are the only corpus-sized job on this
    * path (the same shape as the BPE trainer's).
    */
  private def corpusEmCore(s: SparkSession, d: String): EmArtifacts =
    graft.SessionCache.getOrBuild(s, s"unigram-emcore|$d") {
      val art = emCore(Tables.documents(s, d)
        .select(explode_outer(tokens(col("text"))).as("w"))
        .filter(col("w").isNotNull)
        .groupBy("w").agg(count(lit(1)).as("cnt")))
      (art, Seq(art.words, art.cost, art.dp))
    }

  private def unigramTokTrain(s: SparkSession, d: String): DataFrame =
    trainFromArtifacts(corpusEmCore(s, d))

  private def unigramTokEncode(s: SparkSession, d: String): DataFrame =
    // The token stream has ONE consumer here (the per-doc fold — the
    // model comes from the cache), so it is not pinned.
    encodeFromArtifacts(corpusEmCore(s, d),
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .filter(col("w").isNotNull))

  /** DuckDB mirror: the DP and backtrack unrolled as MATERIALIZED CTE
    * steps (without materialization the accumulator chain inlines
    * exponentially — a{k} references a{k-1} twice), QUALIFY row_number
    * for the per-position min (equivalent to the Spark struct-min:
    * the minimum is unique, see [[trainFrame]]).
    */
  /** The shared CTE prelude (frequency classes → spans → costed vocab
    * → completed DP accumulator a[[MaxWordLen]]) — the SQL mirror of
    * [[emCore]], shared by the train and encode oracles.
    */
  private def coreSql: String = {
    val dpSteps = (1 to MaxWordLen).map { i =>
      val prev = if (i == 1) "d0" else s"a${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT m.w, $i AS pos,
         |    d.cost + m.pc AS cost, d.np + 1 AS np, d.pos AS bj
         |  FROM m JOIN $prev d ON d.w = m.w AND d.pos = m.j
         |  WHERE m.i = $i
         |  QUALIFY row_number() OVER (PARTITION BY m.w
         |    ORDER BY d.cost + m.pc, d.np + 1, d.pos) = 1),
         |a$i AS MATERIALIZED (SELECT * FROM $prev
         |  UNION ALL SELECT * FROM d$i)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT t AS w, count(*) AS cnt FROM
       |    (SELECT unnest(${TextQueries.toksSql}) AS t FROM documents)
       |    GROUP BY 1),
       |w AS MATERIALIZED (SELECT * FROM w0 WHERE len(w) <= $MaxWordLen),
       |sp AS MATERIALIZED (SELECT w.w, w.cnt, j, j + l AS i,
       |    substr(w.w, j + 1, l) AS piece
       |  FROM w, UNNEST(range(0, len(w.w))) AS tj(j),
       |    UNNEST(range(1, 1 + least($MaxPieceLen, len(w.w) - j))) AS tl(l)),
       |seed AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
       |         FROM sp GROUP BY 1),
       |mc AS (SELECT piece, c FROM seed WHERE len(piece) > 1
       |       ORDER BY c DESC, piece LIMIT $MultiVocab),
       |vocab AS (SELECT piece, c FROM seed WHERE len(piece) = 1
       |          UNION ALL SELECT piece, c FROM mc),
       |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab),
       |cost AS MATERIALIZED (SELECT piece, c,
       |    CAST(round(1000000.0 * ln(CAST(t AS DOUBLE) / c), 0) AS BIGINT)
       |      AS pc
       |  FROM vocab CROSS JOIN tt),
       |m AS MATERIALIZED (SELECT sp.w, sp.j, sp.i, cost.pc
       |  FROM sp JOIN cost USING (piece)),
       |d0 AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost,
       |       0 AS np, 0 AS bj FROM w),
       |$dpSteps""".stripMargin
  }

  private def oracle: String = {
    val btSteps = (1 to MaxWordLen).map { k =>
      val prev = if (k == 1) "b0" else s"b${k - 1}"
      s"""u$k AS MATERIALIZED (SELECT b.w, a.bj, b.pos, b.cnt
         |  FROM $prev b JOIN a$MaxWordLen a
         |    ON a.w = b.w AND a.pos = b.pos WHERE b.pos > 0),
         |b$k AS (SELECT w, bj AS pos, cnt FROM u$k)""".stripMargin
    }.mkString(",\n")
    val used = (1 to MaxWordLen)
      .map(k => s"SELECT substr(w, bj + 1, pos - bj) AS piece, cnt FROM u$k")
      .mkString("\nUNION ALL\n")
    s"""WITH $coreSql,
       |b0 AS (SELECT w.w, len(w.w) AS pos, w.cnt FROM w),
       |$btSteps,
       |used AS ($used),
       |em AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS em
       |       FROM used GROUP BY 1)
       |SELECT cost.piece, cost.c AS seed_count, cost.pc AS piece_cost,
       |  CAST(coalesce(em.em, 0) AS BIGINT) AS em_count
       |FROM cost LEFT JOIN em USING (piece)
       |ORDER BY em_count DESC, cost.piece LIMIT $TopK""".stripMargin
  }

  /** Encode oracle: the shared DP prelude, each word's optimal piece
    * count at its final position, and the per-doc LEFT-join fold
    * (unmatched = over-cap word = skipped).
    */
  private def encodeOracle: String =
    s"""WITH $coreSql,
       |wp AS MATERIALIZED (SELECT a.w, a.np FROM a$MaxWordLen a
       |  JOIN w ON w.w = a.w AND a.pos = len(w.w)),
       |dt AS (SELECT doc_id, t AS w FROM
       |  (SELECT doc_id, unnest(${TextQueries.toksSql}) AS t
       |   FROM documents))
       |SELECT doc_id,
       |  CAST(count(wp.np) AS BIGINT) AS n_words,
       |  CAST(coalesce(sum(wp.np), 0) AS BIGINT) AS n_pieces,
       |  CAST(coalesce(sum(CASE WHEN wp.np IS NOT NULL
       |    THEN len(dt.w) END), 0) AS BIGINT) AS n_chars,
       |  CAST(sum(CASE WHEN wp.np IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_skipped
       |FROM dt LEFT JOIN wp USING (w)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q_unigram_tok_train", unigramTokTrain, Some(oracle)),
    QueryDef("q_unigram_tok_encode", unigramTokEncode, Some(encodeOracle))
  )
}
