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
  * keep rule is TRUE greedy keep-first in id order: walk ids
  * ascending, keep a vector iff it is not `tau`-close to any
  * already-KEPT vector. (The simpler "drop iff any smaller id is
  * τ-close" rule over-drops on similarity chains u–v–w where
  * cos(u,w) < τ: greedy keeps {u, w}, the pair rule drops both v and
  * w.) Greedy is sequential by nature, so it runs as a streaming
  * per-partition kernel over the cell-partitioned, (cell, id)-sorted
  * frame: rows arrive in id order, each compares against the kept
  * vectors buffered so far, and only the KEPT vectors of the first
  * `maxCell` ids are ever held in memory — the shuffle moves each
  * cell's (id, vector) once.
  *
  * SemDeDup sizes cells to be bounded (FAISS-style √n cells), but a
  * real quantizer produces hot cells (mode collapse, boilerplate
  * embeddings), so the sizing contract is ENFORCED, not assumed:
  * past `maxCell` rows in one cell the kernel degrades LOUDLY — the
  * greedy examines the first `maxCell` ids, every later row is kept
  * unexamined with its `examined` flag false, and [[summary]] reports
  * the per-cell `n_unexamined` count (the SimHash star-pair degrade
  * pattern: bounded work, never a silent OOM, never silent drops —
  * degrading toward keeping is the conservative direction for
  * dedup). Worst-case kernel memory is `maxCell` vectors
  * (`maxCell × dim × 8` bytes) regardless of cell skew; callers with
  * fat embeddings size `maxCell` down accordingly, and a persistent
  * `n_unexamined > 0` says to re-fit the quantizer with more cells
  * (or sub-split the hot cell) rather than raise the cap.
  *
  * The kept set is auditable without re-running the quantizer: no two
  * EXAMINED kept vectors in one cell may be `tau`-close (a later
  * τ-close vector would have seen the earlier kept one as its
  * witness), which [[soundViolations]] checks as an empty-set
  * contract — through the codegen'd Column cosine, a code path
  * independent of the greedy kernel's scalar loop. Unexamined rows
  * are excluded: the degrade contract makes no pairwise claim about
  * them, and `n_unexamined` is the loud signal that the claim is
  * partial.
  *
  * The greedy flags build once per (session, dataset, k, τ) in
  * [[graft.SessionCache]]; `summary` and the audit both read the
  * cached flags, so the quadratic-in-cell work runs once per session,
  * not once per entry.
  */
object SemDedup {

  /** Default per-cell examination cap: 64Ki vectors ≈ 400 MB of kernel
    * memory at 768-dim doubles, and a bounded O(maxCell · kept) greedy.
    */
  val DefaultMaxCell: Int = 1 << 16

  /** Per-cell dedup summary: cell, vector count, kept, dropped, and the
    * over-cap degrade count (`n_unexamined` — rows past `maxCell` kept
    * without pairwise examination; 0 everywhere when the quantizer's
    * sizing contract holds).
    */
  def summary(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String,
      maxCell: Int = DefaultMaxCell): DataFrame =
    keepFlags(vectors, idCol, vecCol, k, tau, datasetKey, maxCell)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("examined"), 0L).otherwise(1L)).as("n_unexamined"))
      .select(col("cell"), col("n_vecs"), col("n_kept"), col("n_dropped"),
        col("n_unexamined"))

  /** Empty-set soundness contract: EXAMINED kept×kept pairs within one
    * cell at cosine ≥ `tau`. Any row is a violation of the greedy keep
    * rule (unexamined over-cap rows carry no pairwise claim — see the
    * object doc). Recomputes the pair cosines via the Column expression
    * path — NOT the greedy kernel's scalar loop — so a broken kernel
    * cannot vouch for itself.
    */
  def soundViolations(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String,
      maxCell: Int = DefaultMaxCell, maxAuditPerCell: Int = 2048): DataFrame = {
    // The audit is a per-cell kept×kept self-join carrying full
    // vectors — O(kept²) pairs in ONE cell-keyed task. The greedy
    // kernel itself is bounded by maxCell, but a high-τ run can keep
    // nearly every examined vector, so the AUDIT is capped too: the
    // first `maxAuditPerCell` kept ids per cell are checked (a greedy
    // violation between ANY audited pair still fails loudly; the cap
    // bounds the task at maxAuditPerCell² pairs instead of letting the
    // integrity check OOM the very skew case the kernel survives).
    import org.apache.spark.sql.expressions.Window
    val keptIds = keepFlags(vectors, idCol, vecCol, k, tau, datasetKey,
        maxCell)
      .filter(col("kept") && col("examined")).select(col("cell"), col("id"))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("id"))))
      .filter(col("__rn") <= maxAuditPerCell)
      .drop("__rn")
    val slim = assignedSlim(vectors, idCol, vecCol, k, datasetKey)
    val kept = slim.join(keptIds,
      slim(idCol) === keptIds("id") && slim("cell") === keptIds("cell"))
      .select(slim("cell"), slim(idCol), slim("__v"))
    val a = kept.select(col("cell"), col(idCol).as("id_a"),
      col("__v").as("__va"))
    val b = kept.select(col("cell"), col(idCol).as("id_b"),
      col("__v").as("__vb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= tau)
      .select(col("cell"), col("id_a"), col("id_b"),
        round(col("cos"), 4).as("cos_sim"))
  }

  private def assignedSlim(vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, datasetKey: String): DataFrame = {
    // The PERSISTED quantizer (round 11): same config key as the IVF
    // ANN entries, so SemDeDup shares their on-disk index — a new
    // session loads the cell assignment instead of re-fitting it.
    val (assigned, _) = IvfIndex.loadOrBuildCached(vectors, idCol,
      vecCol, k, IndexDirs.ivf(datasetKey, idCol, vecCol, k))
    assigned.select(col("cell"), col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
  }

  /** (cell, id, kept, examined) greedy flags, built once per
    * session/config. The frame is hash-partitioned by cell and sorted
    * (cell, id) within partitions, so the kernel streams rows in
    * exactly greedy order and never materializes a cell: state is the
    * kept vectors of the current cell's first `maxCell` ids — bounded
    * by `maxCell` no matter how skewed the quantizer assignment is.
    */
  private def keepFlags(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String, maxCell: Int): DataFrame = {
    require(maxCell > 0, s"maxCell must be positive, got $maxCell")
    val spark = vectors.sparkSession
    graft.SessionCache.getOrBuild(spark,
      s"semdedup|$datasetKey|$idCol|$vecCol|k=$k|tau=$tau|cap=$maxCell") {
      import spark.implicits._
      val slim = assignedSlim(vectors, idCol, vecCol, k, datasetKey)
        .select(col("cell"), col(idCol).cast("long").as("id"), col("__v"))
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("id"))
        .as[(Int, Long, Seq[Double])]
      val out = slim.mapPartitions { rows =>
        new Iterator[(Int, Long, Boolean, Boolean)] {
          private var curCell = 0
          private var started = false
          private var examined = 0
          private val keptVecs =
            new scala.collection.mutable.ArrayBuffer[Array[Double]]()
          private val keptNorms =
            new scala.collection.mutable.ArrayBuffer[Double]()
          override def hasNext: Boolean = rows.hasNext
          override def next(): (Int, Long, Boolean, Boolean) = {
            val (cell, id, v) = rows.next()
            if (!started || cell != curCell) {
              curCell = cell; started = true; examined = 0
              keptVecs.clear(); keptNorms.clear()
            }
            if (examined >= maxCell) {
              // Over-cap degrade: kept without examination, flagged.
              (cell, id, true, false)
            } else {
              examined += 1
              val a = v.toArray
              var s = 0.0; var i = 0
              while (i < a.length) { s += a(i) * a(i); i += 1 }
              val na = math.sqrt(s)
              var isDup = false
              var j = 0
              while (j < keptVecs.length && !isDup) {
                val b = keptVecs(j)
                var d = 0.0; var t = 0
                val n = math.min(a.length, b.length)
                while (t < n) { d += a(t) * b(t); t += 1 }
                val denom = na * keptNorms(j)
                // zero-norm vectors are never τ-close (cos undefined)
                if (denom > 0 && d / denom >= tau) isDup = true
                j += 1
              }
              if (!isDup) { keptVecs += a; keptNorms += na }
              (cell, id, !isDup, true)
            }
          }
        }
      }
        .toDF("cell", "id", "kept", "examined")
        .persist()
      out.count()
      (out, Seq(out))
    }
  }
}
