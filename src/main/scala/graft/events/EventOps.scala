package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators the reference's batch surface lacks but any
  * large-scale event/training-data pipeline needs: as-of (most-recent
  * prior) joins and gap-based sessionization.
  *
  * Both are built as SINGLE-SHUFFLE plans — one hash exchange on the
  * key plus an in-partition sort — because that is the shape that
  * survives 100 TB:
  *
  *  - The naive as-of formulation is a range join
  *    (`l.ts >= r.ts AND r.ts > l.ts - tol` + greatest-per-key), which
  *    Spark plans as a broadcast-nested-loop or a sort-merge with an
  *    inequality residual — per-key quadratic when keys repeat.
  *    The union+ordered-window form below is the classic
  *    merge-as-of: tag both sides, sort each key's timeline once, and
  *    carry the latest right row forward with
  *    `last(..., ignoreNulls)` — O(n log n) per key, no pair blowup,
  *    AQE-splittable like any window.
  *  - Sessionization uses Spark's native `session_window` aggregation
  *    (the same operator Structured Streaming uses for streaming
  *    sessions, so the batch and streaming plans share semantics);
  *    its merge phase is a partial-aggregation shuffle, not a window
  *    sort.
  */
object EventOps {

  /** As-of join: for every left row, attach the LATEST right row of
    * the same key with `right.ts <= left.ts` (and, when `tolerance` is
    * set, `right.ts >= left.ts - tolerance`); no match → null payload.
    *
    * Tie-breaks are fully deterministic: right rows sharing
    * (key, ts) resolve by ascending `rightTieBreak` (last one wins),
    * and a right row AT the left row's timestamp is eligible
    * (`<=` semantics, matching pandas `merge_asof` and DuckDB
    * ASOF JOIN's closed bound).
    *
    * @param keys          equi-join key columns (present in both)
    * @param leftTs        left event-time column
    * @param rightTs       right event-time column
    * @param rightPayload  right columns to attach (caller renames to
    *                      avoid collisions with left output columns)
    * @param rightTieBreak non-null right column ordering same-timestamp
    *                      right rows (ascending; the last is kept)
    * @param tolerance     optional maximum `left.ts − right.ts` lookback
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      rightTieBreak: String, tolerance: Option[Column] = None): DataFrame = {
    val keyCols = keys.map(col)
    // Right rows carry their payload (timestamp included, for the
    // tolerance check) in one struct; left rows carry nulls in those
    // slots. The tag orders a right row BEFORE a left row at the same
    // timestamp, giving the closed `right.ts <= left.ts` bound.
    val payload = struct(
      (col(rightTs).as("__rts") +: rightPayload.map(col)): _*)
    val rTagged = right.select(
      keyCols ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightTieBreak).as("__tie"), payload.as("__r")): _*)
    val lTagged = left.select(
      keyCols ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(col("*")).as("__l")): _*)

    // One exchange on the key; the per-key ordered pass resolves every
    // left row in a single sweep. Left rows order AFTER right rows at
    // equal ts (side 1 > 0); same-ts right rows order by the tie-break,
    // which is non-null on the right — the null-ordering divergence
    // between engines can never reorder rows that matter.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = tolerance match {
      case Some(tol) => col("__m").isNotNull && col("__m.__rts") >= col("__ts") - tol
      case None      => col("__m").isNotNull
    }
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val matchCols = rightPayload.map(c =>
      when(inTol, col(s"__m.$c")).otherwise(lit(null)).as(c)) :+
      when(inTol, col("__m.__rts")).otherwise(lit(null)).as("matched_ts")
    matched.select(leftCols ++ matchCols: _*)
  }

  /** Gap-based sessionization with per-session aggregates, on Spark's
    * native `session_window` (a new session starts when the gap since
    * the previous event EXCEEDS `gap`; a gap of exactly `gap` still
    * merges — session ends are inclusive in Spark's merge). Emits one
    * row per (key, session) with start/end bounds and the caller's
    * aggregate columns.
    *
    * `session_window`'s merge runs as partial aggregation + one
    * key-hash shuffle (NOT a per-key window sort), and is the exact
    * operator Structured Streaming uses for streaming sessions — the
    * batch semantics here transfer to a `readStream` source unchanged.
    */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
      gap: String, aggs: Seq[Column]): DataFrame = {
    val sessionCols = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events"))
    events
      .groupBy((keys.map(col) :+ session_window(col(tsCol), gap).as("__sw")): _*)
      .agg(sessionCols.head, (sessionCols.tail ++ aggs): _*)
      .drop("__sw")
  }
}
