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
  * w.) Greedy is sequential by nature, so it runs as one in-memory
  * pass per cell inside `flatMapGroups` — a deliberate per-partition
  * imperative kernel, sound exactly because SemDeDup sizes cells to
  * be bounded (FAISS-style √n cells); the shuffle moves each cell's
  * (id, vector) once.
  *
  * The kept set is auditable without re-running the quantizer: no two
  * KEPT vectors in one cell may be `tau`-close (a later τ-close
  * vector would have seen the earlier kept one as its witness), which
  * [[soundViolations]] checks as an empty-set contract — through the
  * codegen'd Column cosine, a code path independent of the greedy
  * kernel's scalar loop.
  *
  * The greedy flags build once per (session, dataset, k, τ) in
  * [[graft.SessionCache]]; `summary` and the audit both read the
  * cached flags, so the quadratic-in-cell work runs once per session,
  * not once per entry.
  */
object SemDedup {

  /** Per-cell dedup summary: cell, vector count, kept, dropped. */
  def summary(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String): DataFrame =
    keepFlags(vectors, idCol, vecCol, k, tau, datasetKey)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"))
      .select(col("cell"), col("n_vecs"), col("n_kept"), col("n_dropped"))

  /** Empty-set soundness contract: kept×kept pairs within one cell at
    * cosine ≥ `tau`. Any row is a violation of the greedy keep rule.
    * Recomputes the pair cosines via the Column expression path — NOT
    * the greedy kernel's scalar loop — so a broken kernel cannot
    * vouch for itself.
    */
  def soundViolations(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String): DataFrame = {
    val keptIds = keepFlags(vectors, idCol, vecCol, k, tau, datasetKey)
      .filter(col("kept")).select(col("cell"), col("id"))
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
    val (assigned, _) =
      IvfIndex.assignCached(vectors, idCol, vecCol, k, datasetKey)
    assigned.select(col("cell"), col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
  }

  /** (cell, id, kept) greedy flags, built once per session/config. */
  private def keepFlags(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, datasetKey: String): DataFrame = {
    val spark = vectors.sparkSession
    graft.SessionCache.getOrBuild(spark,
      s"semdedup|$datasetKey|$idCol|$vecCol|k=$k|tau=$tau") {
      import spark.implicits._
      val slim = assignedSlim(vectors, idCol, vecCol, k, datasetKey)
        .select(col("cell"), col(idCol).cast("long").as("id"), col("__v"))
        .as[(Int, Long, Seq[Double])]
      val out = slim.groupByKey(_._1)
        .flatMapGroups { (cell: Int, it: Iterator[(Int, Long, Seq[Double])]) =>
          // One cell is held in memory — bounded by the quantizer
          // sizing contract (see object doc).
          val vs = it.map { case (_, id, v) => (id, v.toArray) }
            .toArray.sortBy(_._1)
          val norms = vs.map { case (_, a) =>
            var s = 0.0; var i = 0
            while (i < a.length) { s += a(i) * a(i); i += 1 }
            math.sqrt(s)
          }
          val kept = new scala.collection.mutable.ArrayBuffer[Int]()
          val flags = Array.ofDim[Boolean](vs.length)
          var i = 0
          while (i < vs.length) {
            var isDup = false
            var j = 0
            while (j < kept.length && !isDup) {
              val kj = kept(j)
              val a = vs(i)._2
              val b = vs(kj)._2
              var d = 0.0; var t = 0
              val n = math.min(a.length, b.length)
              while (t < n) { d += a(t) * b(t); t += 1 }
              val denom = norms(i) * norms(kj)
              // zero-norm vectors are never τ-close (cos undefined)
              if (denom > 0 && d / denom >= tau) isDup = true
              j += 1
            }
            if (!isDup) kept += i
            flags(i) = !isDup
            i += 1
          }
          vs.indices.iterator.map(x => (cell, vs(x)._1, flags(x)))
        }
        .toDF("cell", "id", "kept")
        .persist()
      out.count()
      (out, Seq(out))
    }
  }
}
