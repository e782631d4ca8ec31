package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics without group buffering.
  *
  * Spark's `percentile` aggregate materializes every value of a group
  * in one aggregation buffer — fine for bounded groups (the
  * corpus-stats rollup), a memory cliff when one group holds 10¹⁰
  * fact rows. This kernel computes the same linearly-interpolated
  * exact percentile from the VALUE HISTOGRAM instead: one map-side
  * partial-aggregating `groupBy(key, value)`, a per-key cumulative
  * window over the histogram (sized by DISTINCT values per key — far
  * below row counts; the `Ranking` two-level bucketing is the in-repo
  * extension if a key's distinct-value count itself explodes), and a
  * rank-interpolation join. Interpolation matches the standard
  * `lower + (rank − floor(rank)) · (upper − lower)` definition both
  * Spark's `percentile` and DuckDB's `quantile_cont` implement, so
  * results are bit-comparable to either.
  */
object Stats {

  /** Exact percentile `p` of `valCol` per `keyCols` → one row per key
    * with the percentile in `out`. Nulls in `valCol` are ignored
    * (aggregate convention); a key with no non-null values emits no
    * row.
    */
  def exactPercentileByKey(df: DataFrame, keyCols: Seq[String],
      valCol: String, p: Double, out: String,
      weightCol: Option[String] = None): DataFrame =
    exactPercentilesByKey(df, keyCols, valCol, Seq(p -> out), weightCol)

  /** Several exact percentiles of the same column in ONE histogram
    * pass — `ps` maps each p to its output column (the IQR and
    * median+p90 shapes: the histogram, cumulative window, and
    * rank-interpolation join are all shared). Numeric columns return
    * the linearly-interpolated exact percentile; non-numeric orderable
    * columns (strings, dates, timestamps) return the exact canonical
    * lower quantile Q(p) = inf{x : F(x) ≥ p} (rank ⌈n·p⌉ − 1 —
    * DuckDB's quantile_disc convention; interpolation is undefined on
    * them).
    *
    * Materialization: the internal histogram is pinned through
    * [[Checkpoint.pin]] (lazily — plan construction runs no pin job) —
    * local blocks by default; set `graft.checkpoint.reliable=true` +
    * `setCheckpointDir` for the executor-loss-survivable HA path on
    * preemptible clusters.
    */
  def exactPercentilesByKey(df: DataFrame, keyCols: Seq[String],
      valCol: String, ps: Seq[(Double, String)],
      weightCol: Option[String] = None): DataFrame = {
    val keys = keyCols.map(col)
    // weightCol: `df` is ALREADY a (key, value, count) histogram — the
    // one-corpus-pass shape when several statistics share the same
    // histogram (see corpusStats).
    val hist0 = df.filter(col(valCol).isNotNull)
      .groupBy(keys :+ col(valCol): _*)
      .agg(weightCol.map(w => sum(col(w)))
        .getOrElse(count(lit(1))).as("__cnt"))
    // The histogram feeds FOUR internal consumers (the min/max probe,
    // the two-level prefix sum's offset and cumulative sides, and the
    // totals) — without pinning, each re-executes the fact scan +
    // aggregation (the pruned copies don't hit ReuseExchange). One
    // pin of the histogram (the kernel's working set,
    // |distinct (key, value)| rows — far below the fact table) makes
    // the corpus scan happen ONCE. The pin is LAZY (eager = false)
    // and the range probe lives in the plan, so building the returned
    // plan runs NO job for any column type — materialization happens
    // at the caller's first action. Storage contract via [[Checkpoint.pin]]:
    // local (unreplicated, executor-loss-fatal) by default, reliable
    // (replicated checkpoint dir, loss-survivable) under
    // `graft.checkpoint.reliable=true`. Weighted calls already receive
    // a caller-materialized histogram and skip the extra pin.
    val hist =
      if (weightCol.isEmpty) Checkpoint.pin(hist0, eager = false) else hist0
    // Cumulative counts in value order. A CONTINUOUS column's
    // histogram is nearly row-sized (every value distinct), so a
    // plain per-key window would funnel one key's whole histogram
    // into a single task — numeric values route through the two-level
    // prefix sum instead (256 value-range buckets; monotone map, so
    // bucket order is exact). STRING columns route through the same
    // prefix sum on a 2-char bucket taken AFTER stripping the key's
    // common prefix: every value of a key shares the longest common
    // prefix of that key's min and max (any divergence before it
    // would sort outside [min, max]), so the strip is order-neutral,
    // and the next 2 chars are an exact coarsening of the full string
    // order under UTF-8 binary comparison (= codepoint order). That
    // spreads the URL/path shape — a corpus of "https://…" values
    // would otherwise share one "ht" bucket — as well as plain
    // high-cardinality ids. Because the min/max LCP IS the common
    // prefix of ALL the key's values (every value sorts inside
    // [min, max], so it must agree with both up to their divergence
    // point), a key with >= 2 distinct values is GUARANTEED >= 2
    // buckets: at position lcp+1 at least two values differ (or one
    // ends). The round-8 collapse — values sharing 66+ identical
    // chars fell into one bucket — came from the old quadratic
    // prefix-equality scan being capped at 64 chars; the scan is now
    // linear (first mismatching position) and capped at 1024, so only
    // a >1024-char shared prefix (pathological; pre-bucket upstream)
    // can still degenerate. DATE/TIMESTAMP columns range-bucket
    // through their monotone epoch projection (unix_date / unix_micros
    // for instants; timezone-independent field arithmetic for NTZ,
    // which has no instant — casting it through the session zone
    // would re-order values falling in a DST gap under non-UTC
    // sessions). Value order is preserved, so the 256 bins are an
    // exact coarsening like the numeric path. Only the remaining
    // orderable types (boolean, binary — rare, discrete by contract)
    // stay on the bounded single-window path.
    import org.apache.spark.sql.types.{DateType, NumericType, StringType,
      TimestampNTZType, TimestampType}
    val dt = df.schema(valCol).dataType
    val numericVal = dt.isInstanceOf[NumericType]
    val stringVal = dt == StringType
    // Monotone numeric projection for 256-bin range bucketing.
    val rangeProj: Option[Column] = dt match {
      case _: NumericType => Some(col(valCol).cast("double"))
      case DateType => Some(unix_date(col(valCol)).cast("double"))
      case TimestampType => Some(unix_micros(col(valCol)).cast("double"))
      case TimestampNTZType =>
        // Wall-clock seconds from FIELDS (date, hour, minute, fractional
        // second): every term is a timezone-independent extraction, so
        // the projection is identical under any session timezone and
        // strictly follows NTZ value order. The previous
        // cast-to-timestamp route interpreted the wall time in the
        // SESSION zone, which is non-monotone across a DST
        // spring-forward gap for non-UTC sessions. Double rounding of
        // a monotone map is weakly monotone, which bucketing needs
        // (collisions only merge neighbors, never reorder).
        Some(unix_date(col(valCol).cast("date")).cast("double") * 86400d +
          hour(col(valCol)) * 3600d + minute(col(valCol)) * 60d +
          date_part(lit("SECOND"), col(valCol)).cast("double"))
      case _ => None
    }
    def prefixSum(bucketed: DataFrame) =
      Ranking.twoLevelPrefixSum(bucketed, partCols = keyCols,
          bucketCol = "__bkt", bucketAsc = true, tieCols = Seq(valCol),
          valCol = "__cnt", out = "__prevsum")
        .withColumn("__cum", col("__prevsum") + col("__cnt"))
        .drop("__bkt")
    val cum = (if (rangeProj.isDefined) {
      val proj = rangeProj.get
      // The [min, max] anchors for the 256 bins are PER KEY and stay
      // IN the plan (a tiny per-key aggregate broadcast back, exactly
      // like the string path's LCP frame) — two round-9 fixes in one:
      //  - a driver-side `.head()` probe used to fire one job per
      //    kernel invocation at construction time (three inside
      //    madOutliers alone); in-plan, construction is side-effect-
      //    free and the probe shares the pinned histogram's job;
      //  - a GLOBAL range collapsed any key whose values occupy a
      //    narrow slice of another key's range into one bucket — the
      //    single-task window funnel the bucketing exists to prevent
      //    (key A in [0, 1] next to key B in [0, 1e9] put every A row
      //    in bucket 0). Per-key anchors spread every key across its
      //    own 256 bins; the prefix sum partitions by key, so per-key
      //    bucketing is exactly as order-correct as global.
      // NaN (float/double inputs only) is excluded from the anchors
      // and pinned to top slot 256 — matching its sorts-after-
      // everything semantics on both engines — so a single NaN cannot
      // poison the bin arithmetic into a one-bucket histogram. A key
      // with no non-NaN values has null __mn; its rows all take the
      // NaN or empty branch (one bucket, trivially consistent).
      val cleanProj = when(isnan(proj), lit(null)).otherwise(proj)
      val bounds = hist.groupBy(keys: _*)
        .agg(min(cleanProj).as("__mn"), max(cleanProj).as("__mx"))
      val bucketed = joinBackByKey(hist, keyCols, bounds, "inner")
        .withColumn("__bkt",
          when(isnan(proj), lit(256))
            .when(col("__mn").isNull, lit(0))
            .otherwise(least(floor((proj - col("__mn")) /
              greatest(col("__mx") - col("__mn"),
                lit(java.lang.Double.MIN_VALUE)) * 256),
              lit(255)).cast("int")))
        .drop("__mn", "__mx")
      prefixSum(bucketed)
    } else if (stringVal) {
      val withLcp = joinBackByKey(hist, keyCols,
        stringLcpByKey(hist, keyCols, valCol), "inner")
      prefixSum(withLcp
          .withColumn("__bkt",
            col(valCol).substr(col("__lcp") + 1, lit(2))))
        .drop("__lcp")
    } else {
      val w = Window.partitionBy(keys: _*).orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("__cum", sum(col("__cnt")).over(w))
    }).withColumn("__prev", col("__cum") - col("__cnt"))
      .drop("__prevsum")
    val tot = hist.groupBy(keys: _*).agg(sum(col("__cnt")).as("__n"))
      .select(keyCols.map(c => col(c).as(s"__k_$c")) :+ col("__n"): _*)
    // Null-safe key join: groupBy keeps null-key groups, an equi-join
    // would drop them.
    val joinCond = keyCols.map(c => col(c) <=> col(s"__k_$c"))
      .reduce[Column](_ && _)
    val aggs = first(col("__n")).as("__n2") +:
      ps.zipWithIndex.flatMap { case ((p, _), i) =>
        if (!numericVal) {
          // Canonical inverse CDF Q(p) = inf{x : F(x) ≥ p} — the 0-based
          // rank ⌈n·p⌉ − 1 (clamped at 0 for p = 0), which is DuckDB's
          // quantile_disc convention; no interpolation pair needed.
          // n·p is round-guarded (9 dp) before the ceil: when it is
          // mathematically integral, a sub-ulp upward error in the
          // double product would otherwise bump the ceil a full rank.
          val rd = greatest(ceil(round(col("__n") * lit(p), 9)) - 1, lit(0))
          Seq(
            max(when(col("__prev") <= rd && rd < col("__cum"),
              col(valCol))).as(s"__vlo_$i"),
            first(lit(null)).as(s"__vhi_$i"))
        } else {
          val r = (col("__n") - 1) * p
          Seq(
            max(when(col("__prev") <= floor(r) && floor(r) < col("__cum"),
              col(valCol))).as(s"__vlo_$i"),
            max(when(col("__prev") <= ceil(r) && ceil(r) < col("__cum"),
              col(valCol))).as(s"__vhi_$i"))
        }
      }
    // No broadcast hint: `tot` is one row PER GROUP, and the kernel is
    // generic over caller keys — at corpus scale a high-cardinality
    // group-by (per-user, per-url) makes a forced broadcast a driver
    // materialization of an unbounded frame (the colloc-lift lesson).
    // AQE broadcasts it whenever it measures under the threshold, which
    // is every driver entry today; past the threshold the null-safe
    // equi-key falls back to a shuffle join on the same keys the
    // histogram already shuffles on.
    val grouped = cum.join(tot, joinCond)
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
    // Non-numeric columns (strings, dates, timestamps) take the exact
    // inverse-CDF value selected above (linear interpolation is
    // undefined on them, and the arithmetic form would coerce the
    // result to null); numeric columns keep the interpolation
    // expression untouched (bit-compatible with Spark's percentile and
    // DuckDB's quantile_cont).
    val withOuts = ps.zipWithIndex.foldLeft(grouped) {
      case (acc, ((p, out), i)) =>
        val r2 = (col("__n2") - 1) * p
        acc.withColumn(out,
          if (!numericVal) col(s"__vlo_$i")
          else col(s"__vlo_$i") +
            (r2 - floor(r2)) * (col(s"__vhi_$i") - col(s"__vlo_$i")))
    }
    withOuts.drop("__n2" +:
      ps.indices.flatMap(i => Seq(s"__vlo_$i", s"__vhi_$i")): _*)
  }

  /** Per-key common-prefix length (`__lcp`) from the key's (min, max)
    * pair: the FIRST position where their chars differ, minus one (or
    * the shorter length when one is a prefix of the other) — a linear
    * scan, one 1-char comparison per position, unlike the round-8
    * quadratic whole-prefix-equality scan whose 64-char cap let
    * 66+-char shared prefixes collapse the string bucketing into one
    * bucket. Capped at 1024 for sanity (the per-position compare is
    * bounded by the ACTUAL min/max lengths first, so short strings pay
    * nothing); guarded for empty/1-value keys where the sequence bound
    * would be 0. One tiny aggregate over histogram rows, broadcast
    * back by the caller.
    */
  private[graft] def stringLcpByKey(hist: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame =
    hist.groupBy(keyCols.map(col): _*)
      .agg(min(col(valCol)).as("__pmin"), max(col(valCol)).as("__pmax"))
      .withColumn("__n", least(length(col("__pmin")),
        length(col("__pmax")), lit(1024)))
      .withColumn("__lcp", when(col("__n") >= 1, coalesce(
        array_min(filter(sequence(lit(1), col("__n")),
          i => col("__pmin").substr(i, lit(1)) =!=
            col("__pmax").substr(i, lit(1)))) - 1,
        col("__n"))).otherwise(0))
      .drop("__pmin", "__pmax", "__n")

  /** Join a small per-key frame back onto `df` with NULL-SAFE key
    * equality (groupBy keeps null-key groups; an equi-join would drop
    * them) — the kernel's standard join-back idiom, defined once.
    * `small`'s key columns must be named like `df`'s; they are aliased
    * away internally so only its payload columns land on `df`.
    *
    * No broadcast HINT: `small` is one row per group, and the kernel
    * is generic over caller keys — a forced broadcast of a
    * high-cardinality group-by's per-key frame is a driver
    * materialization of an unbounded frame at corpus scale (the
    * colloc-lift lesson). AQE broadcasts it whenever it measures under
    * the threshold — every driver entry today; past it, the null-safe
    * equi-key falls back to a shuffle join on the keys the histogram
    * already shuffles on.
    */
  def joinBackByKey(df: DataFrame, keyCols: Seq[String],
      small: DataFrame, joinType: String = "left"): DataFrame = {
    val aliased = small.select(small.columns.map {
      case c if keyCols.contains(c) => col(c).as(s"__jb_$c")
      case c => col(c)
    }.toSeq: _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__jb_$c"))
      .reduce[Column](_ && _)
    df.join(aliased, cond, joinType)
      .drop(keyCols.map(c => s"__jb_$c"): _*)
  }

  /** Robust outlier report per key: exact median, exact MAD (median
    * absolute deviation), and the count of rows beyond
    * `k · 1.4826 · MAD` of the median (1.4826 = the consistency
    * constant making MAD estimate σ under normality). ONE corpus pass:
    * the (key, value) histogram is materialized once and every later
    * step — median, the |v − med| histogram, MAD, the outlier count —
    * runs on histogram rows via the weighted kernel, so the fact
    * table is never rescanned and no group's values are ever
    * buffered.
    */
  def madOutliers(df: DataFrame, keyCols: Seq[String], valCol: String,
      k: Double = 3.0): DataFrame = {
    val keys = keyCols.map(col)
    // one fact scan; three histogram consumers (policy-routed pin,
    // lazy — the first percentile pass materializes it)
    val hist = Checkpoint.pin(df.filter(col(valCol).isNotNull)
      .groupBy(keys :+ col(valCol): _*)
      .agg(count(lit(1)).as("__cnt")), eager = false)
    // The per-key median is a |keys|-row frame consumed by EVERY
    // replica of the deviation histogram below — pinned (round-16:
    // unpinned, its whole percentile sub-plan — windows, prefix sums,
    // rank join — replayed once per consumer of adHist; the driver
    // entry's physical plan was 166 KB of duplicated subtrees and the
    // entry measured 4.3 s at sf0.1 for two histogram passes).
    val med = Checkpoint.pin(
      exactPercentileByKey(hist, keyCols, valCol, 0.5, "__med",
        weightCol = Some("__cnt")), eager = false)
    // The weighted kernel path deliberately skips its internal pin on
    // the contract that the caller hands it a MATERIALIZED histogram
    // (see exactPercentilesByKey) — honor it: adHist feeds the MAD
    // pass's four internal consumers plus the final fold.
    val adHist = Checkpoint.pin(
      joinBackByKey(hist, keyCols, med, "inner")
        .withColumn("__ad", abs(col(valCol) - col("__med"))),
      eager = false)
    val mad = Checkpoint.pin(
      exactPercentileByKey(adHist, keyCols, "__ad", 0.5, "__mad",
        weightCol = Some("__cnt")), eager = false)
    joinBackByKey(adHist, keyCols, mad, "inner")
      .groupBy(keys: _*)
      .agg(sum(col("__cnt")).as("n"),
        round(first(col("__med")), 4).as("median"),
        round(first(col("__mad")), 4).as("mad"),
        sum(when(col("__ad") > lit(k) * 1.4826 * col("__mad"),
          col("__cnt")).otherwise(0L)).as("n_outliers"))
  }
}
