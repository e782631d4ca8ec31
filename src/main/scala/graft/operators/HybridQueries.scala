package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.text.TextFunctions.tokens
import graft.vector.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.) of
  * a lexical BM25 ranking and a dense cosine ranking over the SAME
  * document corpus: the retrieval shape every modern RAG / curation
  * pipeline runs, where neither modality alone ranks well and the
  * fusion needs no score calibration (ranks only). Composes the two
  * proven kernels of this library — q_text_bm25's exact-integer-input
  * score expression and q_vector_topk's rounded cosine — and fuses
  * with 1/(k + rank), k = 60 (the canonical constant).
  *
  * Engine-parity: each modality ranks on its ROUNDED score (the
  * rounding both gates prove bit-identical across engines) with a
  * doc-id tie-break, so ranks are exact integers; the RRF sum is then
  * ONE two-term double expression over those integers — evaluated
  * with the identical operation tree in both engines (explicit DOUBLE
  * casts keep DuckDB out of DECIMAL arithmetic) and ordered on its
  * 9-dp rounding with a doc-id tie-break.
  *
  * Scale: the candidate depth is [[TopN]] per modality — both rank
  * filters compile to WindowGroupLimit (each partition keeps its own
  * top-N before the single-key exchange, the q_topk_orders plan), the
  * BM25 side scores only the ≤|terms|·|docs-with-term| posting rows
  * of the 3 query terms, and the fusion join is TopN-vs-TopN — the
  * whole query never shuffles the corpus.
  */
object HybridQueries extends QueryModule {

  /** Fixed lexical query (terms of the synthetic corpus vocabulary);
    * the dense query is embedding 0, the q_vector_topk precedent.
    */
  private val QueryTerms = Seq("spark", "join", "hash")

  private val RrfK = 60
  private val TopN = 100
  private val TopK = 20

  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    // Lexical side: the shared scored-postings frame (the ONE copy of
    // the BM25 expression tree, session-cached) restricted to the
    // query terms and summed per doc over a SORTED fold (≤3 doubles —
    // the bigram-LM discipline).
    val tRank = TextQueries.bm25Scored(s, d)
      .filter(col("term").isin(QueryTerms: _*)).groupBy("doc_id")
      .agg(aggregate(array_sort(collect_list(col("score"))),
        lit(0.0), _ + _).as("ts"))
      .withColumn("text_rank", row_number().over(
        Window.orderBy(round(col("ts"), 6).desc, col("doc_id"))))
      .filter(col("text_rank") <= TopN)
      .select(col("doc_id"), col("text_rank"))
    // Dense side: rounded cosine against embedding 0, rank with the
    // same rounded-score + id discipline.
    val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qvec"))
    val vRank = Tables.embeddings(s, d)
      .filter(col("embedding").isNotNull)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(VectorOps.cosine(col("embedding").cast("array<double>"),
          col("qvec")), 4).as("cs"))
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cs").desc, col("doc_id"))))
      .filter(col("vec_rank") <= TopN)
      .select(col("doc_id"), col("vec_rank"))
    // Fusion: a doc absent from one list contributes 0 from it (the
    // standard RRF convention) — FULL outer join of the two TopN
    // frames, one fixed-order two-term sum.
    tRank.join(vRank, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("text_rank"), col("vec_rank"),
        (coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("text_rank")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("vec_rank")),
            lit(0.0))).as("rrf"))
      .orderBy(round(col("rrf"), 9).desc, col("doc_id"))
      .limit(TopK)
      .select(col("doc_id"), col("text_rank"), col("vec_rank"),
        round(col("rrf"), 6).as("rrf_r6"))
  }

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_hybrid_rrf", hybridRrf, Some(
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${TextQueries.toksSql}) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
         |       FROM tf GROUP BY 1),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl
         |       FROM dl),
         |sc AS (
         |  SELECT doc_id,
         |    ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
         |      (tf + 1.2 * (0.25 + 0.75 * dl * n / sum_dl)) AS score
         |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term)
         |  CROSS JOIN st
         |  WHERE term IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})),
         |ts AS (SELECT doc_id, list_sum(list_sort(list(score))) AS ts
         |       FROM sc GROUP BY 1),
         |tr AS (SELECT doc_id, row_number() OVER
         |    (ORDER BY round(ts, 6) DESC, doc_id) AS text_rank FROM ts),
         |trf AS (SELECT * FROM tr WHERE text_rank <= $TopN),
         |q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings
         |      WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |    round(list_cosine_similarity(embedding::DOUBLE[], qvec), 4)
         |      AS cs
         |  FROM embeddings, q WHERE embedding IS NOT NULL),
         |vr AS (SELECT doc_id, row_number() OVER
         |    (ORDER BY cs DESC, doc_id) AS vec_rank FROM vs),
         |vrf AS (SELECT * FROM vr WHERE vec_rank <= $TopN),
         |fu AS (SELECT coalesce(trf.doc_id, vrf.doc_id) AS doc_id,
         |    trf.text_rank, vrf.vec_rank,
         |    coalesce(CAST(1 AS DOUBLE)
         |        / (CAST($RrfK AS DOUBLE) + trf.text_rank),
         |      CAST(0 AS DOUBLE)) +
         |    coalesce(CAST(1 AS DOUBLE)
         |        / (CAST($RrfK AS DOUBLE) + vrf.vec_rank),
         |      CAST(0 AS DOUBLE)) AS rrf
         |  FROM trf FULL OUTER JOIN vrf ON trf.doc_id = vrf.doc_id)
         |SELECT doc_id, CAST(text_rank AS INT) AS text_rank,
         |  CAST(vec_rank AS INT) AS vec_rank, round(rrf, 6) AS rrf_r6
         |FROM fu ORDER BY round(rrf, 9) DESC, doc_id LIMIT $TopK"""
        .stripMargin))
  )
}
