package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.events.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-timeline operators over the `events` table: as-of joins and
  * gap sessionization — the single-shuffle event-pipeline shapes
  * documented in [[graft.events.EventOps]]. Both entries are fully
  * SQL-expressible and carry exact DuckDB oracles (the as-of oracle
  * re-derives the merge-as-of with window functions rather than
  * DuckDB's ASOF JOIN, whose same-timestamp tie-break is unspecified).
  */
object EventQueries extends QueryModule {

  /** For every click, the latest purchase by the same user at-or-before
    * the click, within a 7-day lookback; unmatched clicks keep null
    * purchase columns.
    */
  private def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    EventOps.asOfJoin(clicks, purchases,
        keys = Seq("user_id"), leftTs = "click_ts", rightTs = "ts",
        rightPayload = Seq("purchase_id", "purchase_value"),
        rightTieBreak = "purchase_id",
        tolerance = Some(expr("INTERVAL 7 DAYS")))
      .withColumnRenamed("matched_ts", "purchase_ts")
  }

  /** Per-user sessions at a 2-hour inactivity gap, with event counts,
    * purchase counts, and an exact (decimal-summed) session value.
    * Doubles sum in nondeterministic order across engines; `value` is
    * exactly 2-decimal in the data, so summing as DECIMAL(18,2) makes
    * the aggregate order-independent and oracle-exact.
    */
  private def sessionizeQ(s: SparkSession, d: String): DataFrame =
    EventOps.sessionize(Tables.events(s, d),
        keys = Seq("user_id"), tsCol = "ts", gap = "2 hours",
        aggs = Seq(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value")))

  /** Interval/range join as a BUCKETIZED EQUI-JOIN — conversion
    * attribution: every non-signup event within 3 days at-or-after a
    * signup by the same user. The naive formulation is a range
    * predicate (`e.ts ∈ [s.ts, s.ts + 3d)`) on a key equi-join, which
    * at skewed scale degrades to per-key quadratic work inside the
    * sort-merge residual — and without the key it would be a
    * broadcast-nested-loop. Bucketizing maps BOTH sides onto covering
    * day buckets (the left explodes to its ≤ 4 covered days, the right
    * to its one day), turning the range condition into a pure
    * (user, day) equi-join followed by the exact residual filter —
    * the standard interval-join shape (Flink's interval join, DuckDB's
    * IEJoin literature) with shuffle keys that AQE can split.
    */
  private def rangeJoinBucketed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("sts"))
      .withColumn("day", explode(expr(
        "sequence(to_date(sts), date_add(to_date(sts), 3))")))
    val others = ev.filter(col("event_type") =!= "signup")
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("day", to_date(col("ts")))
    signups.join(others, Seq("user_id", "day"))
      .filter(col("ts") >= col("sts") &&
        col("ts") < col("sts") + expr("INTERVAL 3 DAYS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("signup_id")).as("n_signups"))
  }

  /** SLIDING event-time windows as a structured stream — 2-day windows
    * every 1 day, so each event lands in exactly two overlapping
    * windows (semantics a tumbling window cannot express; the moving
    * 48-hour health counter). Same bounded harness and oracle gate as
    * q_stream_window; the oracle materializes the overlap by
    * unnesting each event's two covering window starts. Spark's
    * windows align to the epoch, which under the UTC session equals
    * the oracle's day-truncation.
    */
  /** File-stream source over the events table — schema from the batch
    * handle, `pathGlobFilter` narrowing the landing DIRECTORY to the
    * one file, and the same TIMESTAMP(NANOS)→timestamp normalization
    * as [[Tables.events]] (watermarks require TIMESTAMP, not NTZ;
    * under the UTC session the wall-clock values are identical). ONE
    * definition for all streaming entries: a fix to the conversion
    * can no longer silently drift between them. `withTs = false`
    * skips the normalization for entries that never read `ts`.
    */
  private def streamingEvents(s: SparkSession, d: String,
      withTs: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val raw = s.readStream.schema(Tables.table(s, d, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    if (!withTs) raw
    else if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Streaming SESSION windows — the one stateful window shape the
    * §2.10 surface still lacked (tumbling/sliding windows, dedup,
    * joins, fMGWS and TWS are covered): `session_window(ts, 2 hours)`
    * keyed by user, with the same aggregate pack as the batch
    * q_sessionize. The oracle is the batch derivation itself; the
    * single-file bounded run is one micro-batch, so CROSS-batch session
    * merging (the part that could silently diverge) is pinned separately
    * by StreamingIngestSpec's MemoryStream test, which fuses one user's
    * session across three micro-batches. Watermarked like production
    * (state for a session evicts once the watermark passes its close);
    * complete mode + memory sink are the bounded check harness, as in
    * q_stream_window. Output start/end are min/max event time (the
    * reference's session bounds), not the half-open window end at
    * last+gap.
    */
  private def streamSession(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamsess|$d") {
      val name = "stream_session_" + java.lang.Integer.toHexString(d.hashCode)
      val ev = streamingEvents(s, d)
      val agg = ev
        .withWatermark("ts", "2 days")
        .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
        .agg(min(col("ts")).as("ss"), max(col("ts")).as("se"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
      val out = graft.streaming.BoundedStream
        .runToTable(s, agg, name, outputMode = "complete")
        .select(col("user_id"),
          col("ss").cast("timestamp_ntz").as("session_start"),
          col("se").cast("timestamp_ntz").as("session_end"),
          col("n_events"), col("n_purchases"), col("total_value"))
      (out, Seq.empty)
    }

  private def streamSliding(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamslide|$d") {
      val name = "stream_sliding_" + java.lang.Integer.toHexString(d.hashCode)
      val ev = streamingEvents(s, d)
      val agg = ev
        .withWatermark("ts", "2 days")
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n"))
      val out = graft.streaming.BoundedStream
        .runToTable(s, agg, name, outputMode = "complete")
        .select(col("w.start").cast("timestamp_ntz").as("window_start"),
          col("n"))
      (out, Seq.empty)
    }

  /** Ordered conversion funnel — signup → first click AFTER signup →
    * first purchase AFTER that click, per user, reported as per-stage
    * user counts (the canonical product-analytics sequence query).
    * ONE shuffle: three chained `min(...) over (partition by user)`
    * windows share the same partitioning, so Catalyst plans a single
    * exchange with in-partition sorts; timestamps compare exactly (no
    * float drift for the oracle). The final distinct collapses the
    * per-event rows to one (user, t1, t2, t3) before the tiny count
    * aggregate.
    */
  private def eventFunnel(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(w))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"))
      .distinct()
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .select(expr(
        """stack(3, '1_signup', n1, '2_click_after', n2,
          |  '3_purchase_after', n3) AS (stage, n_users)""".stripMargin))
  }

  /** Weekly cohort retention — users grouped by signup week, distinct
    * active users counted per week-offset since signup (the standard
    * retention triangle). Day arithmetic runs on DATE-truncated values
    * on both engines so the offsets agree exactly. Two shuffles: the
    * per-user signup aggregate, then the (cohort, offset) distinct
    * count; the signup side joins back broadcast-eligible (one row per
    * user, far smaller than the event log).
    */
  private def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    ev.join(signup, Seq("user_id"))
      .filter(col("ts") >= col("t0"))
      .select(
        date_trunc("week", col("t0")).cast("date").as("cohort_week"),
        floor(datediff(col("ts").cast("date"), col("t0").cast("date")) / 7)
          .as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** STREAM-STREAM inner join as a structured stream — signup→click
    * attribution within 3 days, the streaming form of
    * [[rangeJoinBucketed]]'s conversion query. Both sides carry
    * watermarks AND the join condition bounds click time relative to
    * signup time in both directions, which is exactly what lets Spark
    * evict join state as the watermark advances — the unbounded-corpus
    * contract (without the bounds, both sides' state grows forever).
    * Inner-join matches emit eagerly in append mode (no window
    * finalization to wait for), so the completed stream must EQUAL the
    * batch range join — the DuckDB oracle.
    */
  private def streamJoin(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamjoin|$d") {
      val name = "stream_join_" + java.lang.Integer.toHexString(d.hashCode)
      // Two independent file-stream sources over the same landing dir —
      // the production shape where each side tails its own topic/path.
      def src(): DataFrame = streamingEvents(s, d)
      val signups = src().filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts").as("sts"))
        .withWatermark("sts", "1 day")
      val clicks = src().filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("cts"))
        .withWatermark("cts", "1 day")
      val joined = signups.join(clicks,
          col("user_id") === col("c_user") &&
          col("cts") >= col("sts") &&
          col("cts") < col("sts") + expr("INTERVAL 3 DAYS"))
        .select(col("signup_id"), col("click_id"), col("user_id"),
          col("sts").cast("timestamp_ntz").as("signup_ts"),
          col("cts").cast("timestamp_ntz").as("click_ts"))
      val out = graft.streaming.BoundedStream
        .runToTable(s, joined, name, outputMode = "append")
      (out, Seq.empty)
    }

  /** Stream-stream LEFT OUTER join — the stateful semantics the inner
    * form cannot express: an unmatched signup's null-click row may only
    * emit once the watermark PROVES no click can still arrive (sts+3d
    * behind the click watermark), i.e. the outer result is a
    * watermark-eviction artifact, not a plain join row. The oracle is
    * the batch left join CENSORED at exactly that frontier: matched
    * pairs are all present (they emit eagerly, as in q_stream_join);
    * null rows appear iff the signup's join window closed under the
    * final GLOBAL watermark — Spark takes the MIN across both sides'
    * watermarks (least(max signup ts, max click ts) − 1 day; the
    * click-side-only frontier emitted one row too many at sf0.1).
    * Spark's terminal no-data micro-batch (on by default) is what
    * flushes the last evictions under Trigger.AvailableNow.
    */
  private def streamLeftJoin(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamljoin|$d") {
      val name = "stream_ljoin_" + java.lang.Integer.toHexString(d.hashCode)
      def src(): DataFrame = streamingEvents(s, d)
      val signups = src().filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts").as("sts"))
        .withWatermark("sts", "1 day")
      val clicks = src().filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("cts"))
        .withWatermark("cts", "1 day")
      val joined = signups.join(clicks,
          col("user_id") === col("c_user") &&
          col("cts") >= col("sts") &&
          col("cts") < col("sts") + expr("INTERVAL 3 DAYS"), "leftOuter")
        .select(col("signup_id"), col("click_id"), col("user_id"),
          col("sts").cast("timestamp_ntz").as("signup_ts"),
          col("cts").cast("timestamp_ntz").as("click_ts"))
      val out = graft.streaming.BoundedStream
        .runToTable(s, joined, name, outputMode = "append")
      (out, Seq.empty)
    }

  /** Forward fill (pandas `ffill` / LOCF — the reference engine's
    * native gap-fill idiom): each event carries the user's most recent
    * purchase value at-or-before it, via `last(ignoreNulls)` over a
    * running frame. ONE key-partitioned window (a single hash
    * shuffle); per-key frames are bounded by a user's history, never
    * corpus size — the standard sensor/price forward-fill at any
    * scale. The (ts, event_id) order is total, so the fill is
    * deterministic and hash-exact against the SQL `last_value IGNORE
    * NULLS` form.
    */
  private def forwardFill(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", col("value")).as("__v"))
      .withColumn("v_filled", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("ts"), col("v_filled"))
  }

  /** Linear interpolation gap-fill (pandas `interpolate(method='time')`
    * over each user's purchase values): a known point keeps its value;
    * a row between two known points gets the time-weighted blend; rows
    * before the first / after the last known point stay null (no
    * extrapolation — that's [[forwardFill]]'s job). One shuffle: both
    * bracket lookups are windows over the same (user, time) order —
    * `last(ignoreNulls)` up to the current row and `first(ignoreNulls)`
    * from it — so Spark plans a single sort with two frame passes.
    * Bit-parity with the oracle: the fraction divides two epoch-ms
    * longs in one IEEE division, the blend mirrors the oracle's
    * textual op order, equal bracket timestamps (a null row tied with
    * a known neighbor) short-circuit to the previous value instead of
    * dividing 0/0, and the 4-decimal rounding is spelled
    * `floor(x·10⁴ + 0.5) / 10⁴` IN BOTH ENGINES — engine-native
    * `round` differs on half-boundary doubles (Spark: decimal-exact
    * HALF_UP; the oracle: FP multiply-round), so both sides compute
    * the identical IEEE op sequence instead.
    */
  private def interpolateLinear(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val base = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wp = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    val wn = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", col("value")).as("v"),
        unix_millis(col("ts").cast("timestamp")).as("t"))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("pt",
        last(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
      .withColumn("nt",
        first(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(wn))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            when(col("nt") === col("pt"), col("pv"))
              .otherwise(floor((col("pv") + (col("nv") - col("pv")) *
                ((col("t") - col("pt")) / (col("nt") - col("pt")))) *
                10000 + 0.5) / 10000.0))
          .as("v_interp"))
  }

  /** First-order Markov transition matrix over each user's event
    * stream: count (state → next state) adjacencies in (time, id)
    * order, then the row-normalized transition probability. The
    * adjacency is one `lead` window (one user-key shuffle); the pair
    * counts and row totals are exact integers, so the probability is
    * one IEEE division both engines compute identically — the same
    * no-float-accumulation discipline as q_regression_trend.
    */
  private def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        col("n").cast("double") /
          sum("n").over(W.partitionBy("event_type")).cast("double"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Frequent behavioral paths: each user's time-ordered event-type
    * sequence cut into trigram paths ("a > b > c"), support-counted
    * corpus-wide, top-15 by exact count. One user-key shuffle builds
    * the ordered sequences (`array_sort` over (ts, id, type) structs —
    * collect order is nondeterministic, the sort makes it total); the
    * path explode is `explode_outer` + null-filter like every computed
    * generator here (the InferFiltersFromGenerate re-evaluation trap).
    */
  private def seqMining(s: SparkSession, d: String): DataFrame = {
    val seqs = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("t"))
    seqs
      .select(explode_outer(
        graft.text.TextFunctions.gramsOf(col("t"), 3, " > ")).as("path"))
      .filter(col("path").isNotNull)
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path")).limit(15)
  }

  /** SCD type-2 dimension build from a change log: each user's
    * purchase values become attribute VERSIONS with half-open validity
    * [valid_from, valid_to) — `valid_to` is the next change's
    * timestamp (one lead window, one key shuffle), null while current.
    * The classical warehouse shape for as-of attribute lookups (pairs
    * with q_asof_join, which consumes exactly such intervals).
    */
  private def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** Exact trailing-7-day distinct users per day — the rolling
    * cardinality every engagement dashboard needs and the op that
    * degenerates at scale if written naively (7 full scans, or a
    * day-range self-join over the fact table). The scalable EXACT
    * form: each (day, user) membership CONTRIBUTES itself to the 7
    * target days it falls in — a bounded map-side expansion (×window)
    * — then one distinct on (target day, user) and a count. The
    * shuffle carries window-factor × membership rows, independent of
    * the raw event count. Days beyond the observed range are cut
    * WITHOUT a second scan: each contribution carries an
    * its-own-day flag, and a target day survives only if some
    * contribution originated on it — a semi-join against observed
    * days would re-scan the fact table for the same answer.
    */
  private def rollingUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .select(explode_outer(sequence(col("day"), date_add(col("day"), 6)))
        .as("target_day"), col("user_id"), col("day"))
      .filter(col("target_day").isNotNull)
      .groupBy("target_day")
      .agg(countDistinct(col("user_id")).as("users_7d"),
        max(when(col("day") === col("target_day"), 1).otherwise(0))
          .as("__obs"))
      .filter(col("__obs") === 1)
      .select(col("target_day"), col("users_7d"))
      .orderBy("target_day")

  /** STREAM-STATIC broadcast join as a structured stream — each event
    * enriched with its user's market segment from the static customer
    * dimension. Stream-static inner joins are STATELESS: every
    * micro-batch joins against the static snapshot and emits
    * immediately (append mode, no watermark, no join state to evict) —
    * which is exactly why this is the unbounded-corpus shape for
    * dimension enrichment, and the broadcast keeps the streaming side
    * shuffle-free (a dim-table shuffle per micro-batch would dominate
    * an event-rate pipeline). The completed stream must EQUAL the
    * batch equi-join — the DuckDB oracle.
    */
  private def streamStaticJoin(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamstatic|$d") {
      val name = "stream_static_" + java.lang.Integer.toHexString(d.hashCode)
      val ev = streamingEvents(s, d)
      val dim = broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")))
      val joined = ev.join(dim, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_mktsegment"),
          col("ts").cast("timestamp_ntz").as("ts"))
      val out = graft.streaming.BoundedStream
        .runToTable(s, joined, name, outputMode = "append")
      (out, Seq.empty)
    }

  /** Custom keyed state as a STRUCTURED STREAM under the oracle gate:
    * `flatMapGroupsWithState` tracks one running long per user and
    * emits a (user, milestone) row each time the cumulative event
    * count crosses another multiple of 5 — the
    * bounded-state/append-emission shape of SURVEY.md §2.10
    * (sessionization alerts, quota trips). The emission SET is
    * batch-split invariant — every multiple ≤ total is crossed exactly
    * once no matter how the files micro-batch — so the stream's output
    * must EQUAL the batch derivation (DuckDB: per-user count unnested
    * to its milestone list), putting the stateful operator under the
    * same hash gate as every batch entry. State is one long per user:
    * eviction under an unbounded key space would use a
    * `GroupStateTimeout`; the check harness is the memory sink.
    */
  private def streamStateful(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamstate|$d") {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      import s.implicits._
      val name = "stream_state_" + java.lang.Integer.toHexString(d.hashCode)
      val src = streamingEvents(s, d, withTs = false)
      // user_id is nullable: a null would kill the Dataset[Long]
      // decoder mid-stream; nulls are excluded on both engines.
      val keyed = src.select(col("user_id").cast("long").as("uid"))
        .filter(col("uid").isNotNull)
        .as[Long].groupByKey(identity)
      val emissions = keyed.flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          ((before / 5 + 1) to (after / 5))
            .map(k => (uid, k * 5L)).iterator
      }.toDF("user_id", "milestone")
      val out = graft.streaming.BoundedStream
        .runToTable(s, emissions, name, outputMode = "append")
        .persist()
      out.count()
      (out, Seq(out))
    }

  /** Keyed state through Spark 4's arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`,
    * RocksDB-backed by requirement): the same batch-split-invariant
    * milestone-crossing semantics as [[streamStateful]] but at
    * multiples of 7 and on the FORWARD state surface — explicit named
    * state handles with per-state TTL config and timer support,
    * the API Spark positions to replace `flatMapGroupsWithState`
    * (which q_stream_stateful keeps covering). Same hash gate: the
    * emission set equals the batch derivation regardless of
    * micro-batching, so DuckDB unnests each user's milestone list.
    */
  private def streamTws(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamtws|$d") {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      import s.implicits._
      val name = "stream_tws_" + java.lang.Integer.toHexString(d.hashCode)
      val src = streamingEvents(s, d, withTs = false)
      val keyed = src.select(col("user_id").cast("long").as("uid"))
        .filter(col("uid").isNotNull)
        .as[Long].groupByKey(identity)
      val emissions = keyed.transformWithState(
        new graft.streaming.MilestoneProcessor(7L),
        TimeMode.None(), OutputMode.Append()
      ).toDF("user_id", "milestone")
      // transformWithState REQUIRES the RocksDB state store provider;
      // scope it to this query (the conf is read at query start, and
      // the other streaming entries keep the default provider).
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(provKey)
      s.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      val out =
        try graft.streaming.BoundedStream
          .runToTable(s, emissions, name, outputMode = "append")
          .persist()
        finally prev match {
          case Some(p) => s.conf.set(provKey, p)
          case None => s.conf.unset(provKey)
        }
      out.count()
      (out, Seq(out))
    }

  /** Event-time windowed aggregation executed as a STRUCTURED STREAM —
    * the same daily counts/sums the batch engine computes, but via
    * `readStream` → watermark → window → `writeStream`, run to
    * completion with `Trigger.AvailableNow` and then hash-checked
    * against the batch DuckDB oracle. This pins the streaming operator
    * surface to the same correctness gate as every batch entry: the
    * stream's final state must EQUAL the batch group-by.
    *
    * Complete output mode + memory sink are the bounded check harness
    * (5 event types × 30 daily windows); the production shape for an
    * unbounded key space is append mode into a file/Kafka sink, where
    * the same watermark actually evicts state — that path (and
    * `flatMapGroupsWithState`) is exercised in StreamingIngestSpec.
    * Session-cached: the stream runs once per (session, dataset).
    */
  private def streamWindow(s: SparkSession, d: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"streamwin|$d") {
      val name = "stream_window_" + java.lang.Integer.toHexString(d.hashCode)
      val ev = streamingEvents(s, d)
      val agg = ev
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
      val out = graft.streaming.BoundedStream
        .runToTable(s, agg, name, outputMode = "complete")
        .select(col("w.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
      (out, Seq.empty)
    }

  /** Batch per-user session derivation (lag-gap + running break sum),
    * shared by q_sessionize and its streaming twin q_stream_session.
    */
  private val sessionizeOracle =
    """WITH o AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM o
      |)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_asof_join", asofJoin, Some(
      """WITH u AS (
        |  SELECT user_id, ts AS uts, 0 AS side, event_id AS tie,
        |         event_id AS r_id, value AS r_val, ts AS r_ts,
        |         CAST(NULL AS BIGINT) AS click_id,
        |         CAST(NULL AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, 1, NULL, NULL, NULL, NULL, event_id, ts
        |  FROM events WHERE event_type = 'click'
        |), m AS (
        |  SELECT *,
        |    last_value(r_id IGNORE NULLS) OVER w AS m_id,
        |    last_value(r_val IGNORE NULLS) OVER w AS m_val,
        |    last_value(r_ts IGNORE NULLS) OVER w AS m_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY uts, side, tie
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT click_id, user_id, click_ts,
        |  CASE WHEN ok THEN m_id END AS purchase_id,
        |  CASE WHEN ok THEN m_val END AS purchase_value,
        |  CASE WHEN ok THEN m_ts END AS purchase_ts
        |FROM (SELECT *,
        |        m_ts IS NOT NULL AND m_ts >= uts - INTERVAL 7 DAY AS ok
        |      FROM m)
        |WHERE side = 1 ORDER BY click_id""".stripMargin)),
    QueryDef("q_sessionize", sessionizeQ, Some(sessionizeOracle)),
    // The streaming form must agree with the BATCH session derivation —
    // the strongest gate on cross-batch session-window state merging.
    QueryDef("q_stream_session", streamSession, Some(sessionizeOracle)),
    QueryDef("q_range_join_bucketed", rangeJoinBucketed, Some(
      """SELECT e.event_type, count(*) AS n_pairs,
        |  count(DISTINCT s.event_id) AS n_signups
        |FROM events s JOIN events e
        |  ON e.user_id = s.user_id
        | AND s.event_type = 'signup' AND e.event_type <> 'signup'
        | AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 3 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q_stream_stateful", streamStateful, Some(
      """WITH c AS (SELECT user_id, count(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT user_id,
        |  unnest(list_transform(range(1, n // 5 + 1),
        |    k -> k * 5)) AS milestone
        |FROM c""".stripMargin)),
    QueryDef("q_stream_tws", streamTws, Some(
      """WITH c AS (SELECT user_id, count(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT user_id,
        |  unnest(list_transform(range(1, n // 7 + 1),
        |    k -> k * 7)) AS milestone
        |FROM c""".stripMargin)),
    QueryDef("q_stream_window", streamWindow, Some(
      """SELECT date_trunc('day', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("q_stream_join", streamJoin, Some(
      """SELECT s.event_id AS signup_id, c.event_id AS click_id,
        |  s.user_id, s.ts AS signup_ts, c.ts AS click_ts
        |FROM events s JOIN events c ON c.user_id = s.user_id
        |WHERE s.event_type = 'signup' AND c.event_type = 'click'
        |  AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 3 DAY
        |ORDER BY signup_id, click_id""".stripMargin)),
    QueryDef("q_stream_left_join", streamLeftJoin, Some(
      """WITH s AS (SELECT event_id signup_id, user_id, ts sts FROM events
        |           WHERE event_type = 'signup'),
        |c AS (SELECT event_id click_id, user_id, ts cts FROM events
        |      WHERE event_type = 'click'),
        |wm AS (SELECT least((SELECT max(sts) FROM s), (SELECT max(cts) FROM c))
        |         - INTERVAL 1 DAY AS w),
        |j AS (SELECT s.signup_id, c.click_id, s.user_id, s.sts, c.cts
        |      FROM s LEFT JOIN c ON c.user_id = s.user_id
        |        AND c.cts >= s.sts AND c.cts < s.sts + INTERVAL 3 DAY)
        |SELECT signup_id, click_id, user_id, sts AS signup_ts,
        |  cts AS click_ts
        |FROM j CROSS JOIN wm
        |WHERE click_id IS NOT NULL OR sts + INTERVAL 3 DAY <= wm.w
        |ORDER BY signup_id, click_id""".stripMargin)),
    QueryDef("q_forward_fill", forwardFill, Some(
      """SELECT event_id, user_id, ts,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_filled
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("q_interpolate_linear", interpolateLinear, Some(
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'purchase' THEN value END AS v,
        |    epoch_ms(ts) AS t FROM events),
        |f AS (SELECT *,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |      OVER wp AS pt,
        |    first_value(v IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |      OVER wn AS nt
        |  FROM e
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, ts,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         CASE WHEN nt = pt THEN pv
        |              ELSE floor((pv + (nv - pv) * ((t - pt) / (nt - pt)))
        |                     * 10000 + 0.5) / 10000.0
        |         END
        |  END AS v_interp
        |FROM f ORDER BY event_id""".stripMargin)),
    QueryDef("q_stream_static_join", streamStaticJoin, Some(
      """SELECT e.event_id, e.user_id, c.c_mktsegment, e.ts
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin)),
    QueryDef("q_rolling_users", rollingUsers, Some(
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events WHERE user_id IS NOT NULL),
        |days AS (SELECT DISTINCT day FROM du),
        |e AS (SELECT DISTINCT d.day AS target_day, u.user_id
        |      FROM du u JOIN days d
        |        ON d.day BETWEEN u.day AND u.day + 6)
        |SELECT target_day, count(*) AS users_7d
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("q_seq_mining", seqMining, Some(
      """WITH sq AS (SELECT list(event_type ORDER BY ts, event_id) AS t
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |g AS (SELECT unnest(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
        |        ELSE list_transform(range(len(t) - 2),
        |          i -> t[i+1] || ' > ' || t[i+2] || ' > ' || t[i+3])
        |      END) AS path FROM sq)
        |SELECT path, count(*) AS n FROM g GROUP BY 1
        |ORDER BY n DESC, path LIMIT 15""".stripMargin)),
    QueryDef("q_scd2_intervals", scd2Intervals, Some(
      """SELECT user_id, event_id, value, ts AS valid_from,
        |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS is_current
        |FROM events
        |WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |ORDER BY user_id, valid_from, event_id""".stripMargin)),
    QueryDef("q_event_transitions", eventTransitions, Some(
      """WITH a AS (SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type, next_type, count(*) AS n FROM a
        |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS prob
        |FROM c ORDER BY event_type, next_type""".stripMargin)),
    QueryDef("q_stream_sliding", streamSliding, Some(
      """WITH w AS (
        |  SELECT unnest([date_trunc('day', ts),
        |    date_trunc('day', ts) - INTERVAL 1 DAY]) AS window_start
        |  FROM events)
        |SELECT window_start, count(*) AS n
        |FROM w GROUP BY 1""".stripMargin)),
    QueryDef("q_event_funnel", eventFunnel, Some(
      """WITH e1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |e2 AS (
        |  SELECT *,
        |    min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2
        |  FROM e1),
        |e3 AS (
        |  SELECT *,
        |    min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3
        |  FROM e2),
        |u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM e3),
        |a AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM u)
        |SELECT '1_signup' AS stage, n1 AS n_users FROM a
        |UNION ALL SELECT '2_click_after', n2 FROM a
        |UNION ALL SELECT '3_purchase_after', n3 FROM a""".stripMargin)),
    QueryDef("q_cohort_retention", cohortRetention, Some(
      """WITH s AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (
        |  SELECT CAST(date_trunc('week', s.t0) AS DATE) AS cohort_week,
        |    CAST(floor(date_diff('day', CAST(s.t0 AS DATE),
        |      CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset,
        |    e.user_id
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.ts >= s.t0)
        |SELECT cohort_week, week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM a GROUP BY 1, 2""".stripMargin)),
    QueryDef("q_json_extract", jsonExtract, Some(
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS DOUBLE) / count(CAST(json_extract_string(props, '$.k')
        |    AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY 1""".stripMargin))
  )

  /** Semi-structured extraction: the `props` JSON column parsed
    * map-side (`get_json_object` path expression — no schema
    * inference, no UDF) and aggregated per event type. The mean is
    * spelled sum/count over exact longs rather than avg(): both
    * engines then divide the SAME two exact integers, where a native
    * running-double mean would expose accumulation-order rounding.
    */
  private def jsonExtract(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 4).as("avg_k"))
  }
}
