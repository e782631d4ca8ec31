package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topic-model-shaped corpus structuring — the last operator family
  * the LLM-pipeline brief lists that the surface lacked: cluster the
  * document corpus in TERM space and report each cluster as its
  * top-weight terms ("topics"), the k-means/NMF-style shape used for
  * corpus exploration and mixture balancing before training.
  *
  * The whole computation is EXACT-INTEGER (the scaled-integer
  * discipline of q_cusum_changepoint / q_graph_pagerank applied to
  * Lloyd's algorithm), so the full topic table hash-checks against a
  * DuckDB re-derivation — no float fold ordering anywhere:
  *
  *  - doc vectors are raw term COUNTS over a top-[[TopicVocab]]
  *    pruned vocabulary (ties by term — deterministic);
  *  - centroids are BIGINT multiples of 1/[[TopicScale]]: the rebuild
  *    `floor(S * sum(x_t) / n_k)` is integer floor-division;
  *  - squared Euclidean distance expands to
  *    `S²·‖x‖² − 2S·⟨x,c⟩ + ‖c‖²` — three integer moments, summed
  *    exactly in any order;
  *  - assignment is the packed-struct argmin `min((d2, topic))`
  *    (ties to the lower topic id — deterministic).
  *
  * Scale posture: the corpus-sized work per iteration is ONE
  * broadcast join of the doc-term frame against the K·V-row centroid
  * table (config-bounded — the legitimate broadcast case) plus
  * map-side-combined aggregates; the doc-term frame and the per-doc
  * moments are pinned once and reused by every iteration. Driver
  * state is the K anchor ids plus the K·V centroid table and the K
  * topic sizes — all config-bounded, nothing data-sized.
  */
object TopicQueries extends QueryModule {

  /** Pruned vocabulary size (top terms by corpus frequency). */
  private val TopicVocab = 64

  /** Cluster count. */
  private val TopicK = 4

  /** Lloyd iterations after the anchor init. */
  private val TopicIters = 2

  /** Fixed-point scale for centroid coordinates. Together with
    * [[TopicTfCap]] it keeps every moment inside BIGINT by
    * construction: S²·‖x‖² ≤ 10⁸·V·cap² ≈ 6·10¹⁷,
    * 2S·⟨x,c⟩ ≤ 2·10⁴·V·cap·(S·cap) ≈ 1.3·10¹⁸, ‖c‖² ≤ V·(S·cap)² ≈
    * 6·10¹⁷ — all under 2⁶³ at ANY corpus size.
    */
  private val TopicScale = 10000L

  /** Per-doc term-frequency clip (standard tf clipping): without it a
    * pathological document repeating one vocabulary term ~10⁶ times
    * silently overflows S²·‖x‖² (ANSI is off for oracle parity, so
    * the wraparound would corrupt, not throw). The clip is part of
    * the operator's semantics and mirrored in the oracle.
    */
  private val TopicTfCap = 10000L

  /** (doc_id, t, x): term counts over the pruned vocabulary. The
    * vocabulary is a TakeOrdered (never a global sort) and joins back
    * by broadcast — V rows, config-bounded.
    */
  private def docTerms(s: SparkSession, d: String): DataFrame = {
    // Round-16: derive from the session-pinned (doc_id, term, tf)
    // posting frame (TextQueries.tfFrame — the retrieval stack's
    // shared term index). The previous form tokenized the corpus
    // TWICE per call (once under the vocabulary aggregate, once under
    // the semi-join); corpus frequency = Σ tf and the per-doc count =
    // tf, so both derive from posting rows without touching the
    // corpus at all.
    val tf = TextQueries.tfFrame(s, d)
    val vocab = tf.groupBy("term").agg(sum(col("tf")).as("cf"))
      .orderBy(desc("cf"), asc("term")).limit(TopicVocab)
      .select("term")
    tf.join(broadcast(vocab), Seq("term"), "left_semi")
      .select(col("doc_id"), col("term").as("t"),
        least(col("tf"), lit(TopicTfCap)).as("x"))
  }

  /** Final topic table: (topic, rk, term, weight_scaled, n_docs) —
    * the top-5 centroid terms per topic after [[TopicIters]] exact
    * Lloyd steps from the anchor-document init (the K largest docs by
    * pruned-token mass, ties by id — the deterministic seeding). Docs
    * with no pruned-vocabulary term are outside the clustering on
    * both engines; a topic that loses all docs keeps no centroid rows
    * (zero vector) and simply stops attracting.
    */
  private def textTopics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val S = TopicScale
    // The pruned doc-term matrix + per-doc moments are the clustering's
    // materialized feature layout — session-pinned (round-16; they were
    // re-derived and re-pinned from the posting frame on every call,
    // two jobs per rep for identical rows — the bfs-adjacency posture).
    val (dt, docNorm) = graft.SessionCache.getOrBuild(
      s, s"topics-dt|$d") {
      val dtF = graft.Checkpoint.pin(docTerms(s, d))
      val dnF = graft.Checkpoint.pin(
        dtF.groupBy("doc_id").agg(sum(col("x") * col("x")).as("xx"),
          sum(col("x")).as("xsum")))
      ((dtF, dnF), Seq(dtF, dnF))
    }
    // K anchor ids are the only driver-side state (config-bounded).
    val anchorIds = docNorm
      .orderBy(desc("xsum"), asc("doc_id")).limit(TopicK)
      .select("doc_id").collect().map(_.getLong(0))
    val anchorDf = anchorIds.toSeq.zipWithIndex
      .map { case (id, k) => (id, k.toLong) }.toDF("doc_id", "topic")
    // The centroid table is ≤ K·V rows — config-bounded — so it lives
    // as a DRIVER-LOCAL frame (the BPE merge-table pattern) instead of
    // a per-iteration localCheckpoint: the three consumers per
    // iteration (norm, dots, rebuild) read a literal, lineage stays
    // flat, and the broadcast join ships driver bytes directly.
    def localize(df: DataFrame): DataFrame =
      s.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
    var cent = localize(
      dt.join(broadcast(anchorDf), Seq("doc_id"))
        .select(col("topic"), col("t"), (col("x") * S).as("c")))
    var sizes: DataFrame = null
    for (_ <- 1 to TopicIters) {
      val centNorm = cent.groupBy("topic")
        .agg(sum(col("c") * col("c")).as("cc"))
      val dots = dt.join(broadcast(cent), Seq("t"))
        .groupBy("doc_id", "topic")
        .agg(sum(col("x") * col("c")).as("dot"))
      val d2 = docNorm.crossJoin(broadcast(centNorm))
        .join(dots, Seq("doc_id", "topic"), "left")
        .select(col("doc_id"), col("topic"),
          (lit(S * S) * col("xx") - lit(2L * S) *
            coalesce(col("dot"), lit(0L)) + col("cc")).as("d2"))
      val assign = d2.groupBy("doc_id")
        .agg(min(struct(col("d2"), col("topic"))).as("m"))
        .select(col("doc_id"), col("m.topic").as("topic"))
      // ONE action per iteration: the rebuilt centroid rows carry the
      // topic size along, so cent AND sizes both come out of a single
      // collect (a second collect re-executed the whole assign chain).
      val rebuilt = dt.join(assign, Seq("doc_id"))
        .groupBy(col("topic"), col("t")).agg(sum(col("x")).as("sx"))
        .join(assign.groupBy("topic").agg(count(lit(1)).as("n")),
          Seq("topic"))
        .select(col("topic"), col("t"),
          expr(s"($S * sx) div n").as("c"), col("n"))
        .collect()
      cent = rebuilt.toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toDF("topic", "t", "c")
      sizes = rebuilt.toSeq.map(r => (r.getLong(0), r.getLong(3)))
        .distinct.toDF("topic", "n")
    }
    // K·V-bounded window — config-sized partitions, not data-sized.
    val w = Window.partitionBy("topic").orderBy(desc("c"), asc("t"))
    cent.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .join(sizes, Seq("topic"))
      .select(col("topic"), col("rk"), col("t").as("term"),
        col("c").as("weight_scaled"), col("n").as("n_docs"))
      .orderBy("topic", "rk")
  }

  /** One unrolled Lloyd step in the oracle: cN/aN/sN out of c(N-1). */
  private def iterSql(i: Int): String = {
    val p = i - 1
    s"""cn$p AS (SELECT topic, CAST(sum(c*c) AS BIGINT) cc
       |         FROM c$p GROUP BY 1),
       |dot$p AS (SELECT dt.doc_id, c$p.topic,
       |           CAST(sum(dt.x * c$p.c) AS BIGINT) dot
       |         FROM dt JOIN c$p USING (t) GROUP BY 1, 2),
       |d2$p AS (SELECT dn.doc_id, cn$p.topic,
       |           100000000 * dn.xx
       |             - 20000 * coalesce(dot$p.dot, 0) + cn$p.cc AS d2
       |         FROM dn CROSS JOIN cn$p
       |         LEFT JOIN dot$p ON dot$p.doc_id = dn.doc_id
       |           AND dot$p.topic = cn$p.topic),
       |a$p AS (SELECT doc_id, topic FROM (
       |          SELECT doc_id, topic, row_number() OVER (
       |            PARTITION BY doc_id ORDER BY d2, topic) rn
       |          FROM d2$p) WHERE rn = 1),
       |s$p AS (SELECT topic, CAST(count(*) AS BIGINT) n
       |        FROM a$p GROUP BY 1),
       |c$i AS (SELECT a$p.topic, dt.t,
       |          (10000 * CAST(sum(dt.x) AS BIGINT)) // s$p.n AS c
       |        FROM dt JOIN a$p USING (doc_id)
       |        JOIN s$p ON s$p.topic = a$p.topic
       |        GROUP BY a$p.topic, dt.t, s$p.n)""".stripMargin
  }

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_text_topics", textTopics, Some(
      s"""WITH tok AS (SELECT doc_id, unnest(${TextQueries.toksSql}) t
         |             FROM documents),
         |tok2 AS (SELECT doc_id, t FROM tok WHERE t IS NOT NULL),
         |vocab AS (SELECT t FROM (
         |    SELECT t, count(*) cf FROM tok2 GROUP BY 1
         |    ORDER BY cf DESC, t LIMIT $TopicVocab)),
         |dt AS (SELECT doc_id, t,
         |         CAST(least(count(*), $TopicTfCap) AS BIGINT) x
         |       FROM tok2 WHERE t IN (SELECT t FROM vocab) GROUP BY 1, 2),
         |dn AS (SELECT doc_id, CAST(sum(x*x) AS BIGINT) xx,
         |         CAST(sum(x) AS BIGINT) xsum
         |       FROM dt GROUP BY 1),
         |anch AS (SELECT doc_id, CAST(row_number() OVER (
         |           ORDER BY xsum DESC, doc_id) - 1 AS BIGINT) topic
         |         FROM dn ORDER BY xsum DESC, doc_id LIMIT $TopicK),
         |c0 AS (SELECT a.topic, dt.t, dt.x * 10000 AS c
         |       FROM dt JOIN anch a USING (doc_id)),
         |${iterSql(1)},
         |${iterSql(2)}
         |SELECT topic, CAST(rk AS INTEGER) AS rk, term, weight_scaled,
         |  n_docs
         |FROM (
         |  SELECT c2.topic, row_number() OVER (
         |      PARTITION BY c2.topic ORDER BY c2.c DESC, c2.t) rk,
         |    c2.t term, c2.c weight_scaled, s1.n n_docs
         |  FROM c2 JOIN s1 USING (topic))
         |WHERE rk <= 5 ORDER BY topic, rk""".stripMargin))
  )
}
