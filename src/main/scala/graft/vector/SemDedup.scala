package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication via cluster-scoped cosine pruning
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): k-means cells partition the
  * embedding space, and near-duplicate pruning runs ONLY within a
  * cell, turning the O(n²) all-pairs sweep into Σ|cell|² — the move
  * that makes embedding dedup tractable at corpus scale (pairs across
  * cells are sacrificed by design; the paper shows the loss is
  * negligible because near-duplicates co-locate under the quantizer).
  *
  * The coarse quantizer is the session-cached [[IvfIndex]] fit (one
  * bounded driver-side sample, map-side assignment — zero extra corpus
  * passes when the ANN entries already built it). Within a cell the
  * keep rule is deterministic: a vector is DROPPED iff some
  * smaller-id vector in the same cell has cosine ≥ `tau` to it —
  * greedy keep-first in id order. That rule makes the survivor set
  * audit-able without re-running the quantizer: no two KEPT vectors in
  * one cell may be `tau`-close (if u < v were both kept with
  * cos ≥ tau, u itself would have been v's drop witness), which
  * [[soundViolations]] checks as an empty-set contract.
  *
  * The pair stage shuffles each cell's (id, vector) once on the cell
  * key; with k sized so cells are bounded (FAISS-style √n cells), the
  * per-cell self-join is the intended quadratic-in-cell work, and AQE
  * skew-split handles an unbalanced cell.
  */
object SemDedup {

  /** Per-cell dedup summary: cell, vector count, kept, dropped. */
  def summary(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String): DataFrame = {
    val assigned = assignedSlim(vectors, idCol, vecCol, k, datasetKey)
    val dropped = droppedIds(assigned, idCol, tau)
      .withColumn("__dropped", lit(1))
    assigned.select(col("cell"), col(idCol))
      .join(dropped, Seq(idCol), "left")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("__dropped").isNotNull, 1L).otherwise(0L))
          .as("n_dropped"))
      .select(col("cell"), col("n_vecs"),
        (col("n_vecs") - col("n_dropped")).as("n_kept"), col("n_dropped"))
  }

  /** Empty-set soundness contract: kept×kept pairs within one cell at
    * cosine ≥ `tau`. Any row is a violation of the greedy keep rule.
    */
  def soundViolations(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String): DataFrame = {
    val assigned = assignedSlim(vectors, idCol, vecCol, k, datasetKey)
    val dropped = droppedIds(assigned, idCol, tau)
      .withColumn("__dropped", lit(1))
    val kept = assigned.join(dropped, Seq(idCol), "left")
      .filter(col("__dropped").isNull)
      .drop("__dropped")
    cellPairs(kept, idCol, tau)
      .select(col("cell"), col("id_a"), col("id_b"),
        round(col("cos"), 4).as("cos_sim"))
  }

  private def assignedSlim(vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, datasetKey: String): DataFrame = {
    val (assigned, _) =
      IvfIndex.assignCached(vectors, idCol, vecCol, k, datasetKey)
    assigned.select(col("cell"), col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
  }

  /** Within-cell ordered pairs (id_a < id_b) at cosine ≥ tau. */
  private def cellPairs(assigned: DataFrame, idCol: String,
      tau: Double): DataFrame = {
    val a = assigned.select(col("cell"), col(idCol).as("id_a"),
      col("__v").as("__va"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"),
      col("__v").as("__vb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"),
        VectorOps.cosine(col("__va"), col("__vb")).as("cos"))
      .filter(col("cos") >= tau)
  }

  private def droppedIds(assigned: DataFrame, idCol: String,
      tau: Double): DataFrame =
    cellPairs(assigned, idCol, tau)
      .select(col("id_b").as(idCol)).distinct()
}
