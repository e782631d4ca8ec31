package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  test("histogram exact percentile equals Spark's buffering percentile") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicates on purpose: the histogram path must weight by count
    val rows = (0 until 2000).map { i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 50) / 2.0)
    } ++ Seq(("gnull", 1.0), ("gnull", 2.0))
    val df = rows.toDF("k", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val ours = graft.Stats.exactPercentileByKey(df, Seq("k"), "v", p, "pv")
        .collect().map(r => r.getString(0) -> r.getAs[Double]("pv")).toMap
      val ref = df.groupBy("k").agg(percentile(col("v"), lit(p)).as("pv"))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("pv")).toMap
      assert(ours == ref, s"p=$p: $ours vs $ref")
    }
  }

  test("null values are ignored and null keys keep their group") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), None),
      (Some("a"), Some(3.0)), (None, Some(10.0)), (None, Some(20.0)))
      .toDF("k", "v")
    val out = graft.Stats.exactPercentileByKey(df, Seq("k"), "v", 0.5, "pv")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Double]("pv"))
      .toMap
    assert(out(Some("a")) == 2.0) // nulls skipped: median of (1, 3)
    assert(out(None) == 15.0)     // null key ranks its own group
  }

  test("string columns rank through the prefix bucketing, not one key window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import spark.implicits._
    // A high-cardinality string column (id/URL shape: nearly every
    // value distinct) must route through the 2-char-prefix two-level
    // prefix sum — the old per-key cumulative window would funnel the
    // near-row-sized histogram of one key into a single task.
    // Zero-padded numerics make lexicographic order equal numeric
    // order, so the exact expected value is computable: strings return
    // the canonical lower quantile Q(p) = inf{x : F(x) >= p} at rank
    // ceil(n*p) - 1 (DuckDB's quantile_disc convention).
    val rows = (0 until 1001).flatMap { v =>
      val s = f"${v * 99}%05d"
      Seq(("a", s), ("b", s), ("b", s)) // duplicates: count-weighted
    } ++ Seq((null.asInstanceOf[String], "00099"))
    val df = rows.toDF("k", "v")
    for ((p, exp) <- Seq(0.0 -> "00000", 0.5 -> "49500", 1.0 -> "99000")) {
      val out = graft.Stats.exactPercentileByKey(df, Seq("k"), "v", p, "pv")
      val got = out.collect()
        .map(r => Option(r.getString(0)) -> r.getAs[String]("pv")).toMap
      assert(got(Some("a")) == exp, s"p=$p")
      assert(got(Some("b")) == exp, s"p=$p (weighted)")
      assert(got(None) == "00099", s"p=$p (null key keeps its group)")
      // Plan audit: every window is either bucket-parallel (key +
      // bucket) or runs over the per-key BUCKET histogram (ordered by
      // __bkt, |prefixes| rows) — never a key-only window ordered by
      // the raw value.
      val windows = out.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }
      assert(windows.nonEmpty)
      windows.foreach { w =>
        val bucketOrdered = w.orderSpec
          .flatMap(_.child.references).exists(_.name == "__bkt")
        assert(w.partitionSpec.size >= 2 || bucketOrdered,
          s"key-only window over the value histogram: ${w.partitionSpec}")
      }
    }
  }

  test("URL-shaped strings spread past the shared prefix; even n takes the lower rank") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import spark.implicits._
    // Every value shares "https://example.com/page0…" — a naive 2-char
    // bucket would put the whole corpus in one "ht" bucket (the exact
    // funnel again). The per-key common-prefix strip must spread the
    // buckets across the first differing characters instead.
    val urls = (0 until 1000).map(v => ("u", f"https://example.com/page$v%05d"))
    val df = urls.toDF("k", "v")
    // n = 1000 even: Q(0.5) = rank ceil(500) - 1 = 499 — the smallest
    // value whose CDF reaches one half.
    val out = graft.Stats.exactPercentileByKey(df, Seq("k"), "v", 0.5, "pv")
    assert(out.collect().head.getAs[String]("pv") ==
      "https://example.com/page00499")
    val windows = out.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val bucketOrdered = w.orderSpec
        .flatMap(_.child.references).exists(_.name == "__bkt")
      assert(w.partitionSpec.size >= 2 || bucketOrdered,
        s"key-only window over the value histogram: ${w.partitionSpec}")
    }
    // The buckets really are past the prefix: distinct 2-char buckets
    // at the first divergence ("00"…"09") must exceed one.
    val lcpStripped = df.select(col("v").substr(lit(26), lit(2))).distinct()
    assert(lcpStripped.count() >= 10)
  }

  test("weighted string histogram input takes count-weighted inverse-CDF values") {
    import spark.implicits._
    // The weightCol shape (df already a (key, value, count) histogram)
    // combined with the string path: Q(p) must rank by the WEIGHTED
    // cumulative counts. Values a(×1), b(×8), c(×1): n = 10, so
    // Q(0.1) = rank 0 = "a", Q(0.5) = rank 4 = "b", Q(1.0) = rank 9
    // = "c" — a plain distinct-value ranking would call Q(0.5) "b"
    // too, but Q(0.1) "a" vs unweighted "a" differs at Q(0.2):
    // weighted rank 1 = "b", unweighted would still sit on "a".
    val hist = Seq(("k", "a", 1L), ("k", "b", 8L), ("k", "c", 1L))
      .toDF("g", "v", "cnt")
    val got = graft.Stats.exactPercentilesByKey(hist, Seq("g"), "v",
        Seq(0.1 -> "p10", 0.2 -> "p20", 0.5 -> "p50", 1.0 -> "p100"),
        weightCol = Some("cnt"))
      .collect().head
    assert(got.getAs[String]("p10") == "a")
    assert(got.getAs[String]("p20") == "b")
    assert(got.getAs[String]("p50") == "b")
    assert(got.getAs[String]("p100") == "c")
  }

  test("date columns take the inverse-CDF value through epoch bucketing") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import spark.implicits._
    // 365 distinct dates: Q(0.5) = rank ceil(365*0.5)-1 = 182 →
    // 2024-01-01 + 182 days; Q(0.0) = the min. The near-row-sized date
    // histogram must range-bucket via unix_date (no key-only window).
    val df = (0 until 365).map(i => ("a", i)).toDF("k", "off")
      .select(col("k"), date_add(lit("2024-01-01").cast("date"),
        col("off")).as("d"))
    val out = graft.Stats.exactPercentileByKey(df, Seq("k"), "d", 0.5, "pd")
    assert(out.collect().head.getAs[java.sql.Date]("pd").toString ==
      "2024-07-01") // 2024-01-01 + 182 days (leap year)
    out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      .foreach { w =>
        val bucketOrdered = w.orderSpec
          .flatMap(_.child.references).exists(_.name == "__bkt")
        assert(w.partitionSpec.size >= 2 || bucketOrdered,
          s"key-only window over the date histogram: ${w.partitionSpec}")
      }
    val lo = graft.Stats.exactPercentileByKey(df, Seq("k"), "d", 0.0, "pd")
    assert(lo.collect().head.getAs[java.sql.Date]("pd").toString ==
      "2024-01-01")
  }

  test("composite keys with nulls rank per group through every join-back") {
    import spark.implicits._
    // Two key columns, one carrying nulls: the kernel's three
    // null-safe key joins (offsets, totals, join-back) must all keep
    // the (a, null) group intact and separate from (a, "x").
    val rows = Seq(
      ("a", Some("x"), 1.0), ("a", Some("x"), 3.0),
      ("a", None, 10.0), ("a", None, 30.0),
      ("b", Some("x"), 5.0))
    val df = rows.map { case (k1, k2, v) => (k1, k2.orNull, v) }
      .toDF("k1", "k2", "v")
    val out = graft.Stats
      .exactPercentileByKey(df, Seq("k1", "k2"), "v", 0.5, "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))) ->
        r.getAs[Double]("pv")).toMap
    assert(out == Map(
      ("a", Some("x")) -> 2.0,
      ("a", None) -> 20.0,
      ("b", Some("x")) -> 5.0))
    // The same composite-key shape through madOutliers (two kernel
    // calls + two join-backs + the final aggregate).
    val mads = graft.Stats.madOutliers(df, Seq("k1", "k2"), "v")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))) ->
        r.getAs[Long]("n")).toMap
    assert(mads == Map(
      ("a", Some("x")) -> 2L, ("a", None) -> 2L, ("b", Some("x")) -> 1L))
  }

  test("madOutliers flags exactly the planted far points") {
    import spark.implicits._
    // 99 points at 10 +- 1, one at 1000: median 10, MAD 1 -> the far
    // point is the single outlier at k=3.
    val rows = (0 until 33).flatMap(i =>
      Seq(("a", 9.0), ("a", 10.0), ("a", 11.0))) :+ ("a", 1000.0)
    val out = graft.Stats.madOutliers(rows.toDF("k", "v"), Seq("k"), "v")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("median") == 10.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("66+-char shared prefixes resolve an exact LCP and spread buckets") {
    import spark.implicits._
    // The round-8 degenerate: the old quadratic LCP scan capped at 64
    // chars, so values sharing 66+ identical chars all bucketed on the
    // SAME 2 chars past the capped prefix — one bucket, single-task
    // cumulative sum. The linear first-mismatch scan (cap 1024) finds
    // the TRUE 70-char prefix, and chars 71-72 then spread the values.
    val pre = "x" * 70
    val rows = (0 until 400).map(v => ("k", f"$pre${v * 13}%04d"))
    val hist = rows.toDF("k", "v").groupBy("k", "v")
      .agg(count(lit(1)).as("__cnt"))
    val lcp = graft.Stats.stringLcpByKey(hist, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Int]("__lcp")).toMap
    assert(lcp == Map("k" -> 70), s"exact LCP expected, got $lcp")
    val spread = hist
      .select(expr("substring(v, 71, 2)").as("bkt")).distinct().count()
    assert(spread > 1, "values must spread past the shared prefix")
    // And the quantiles themselves stay exact: zero-padded suffixes
    // make lexicographic = numeric order.
    val sortedVals = rows.map(_._2).sorted
    val out = graft.Stats.exactPercentilesByKey(rows.toDF("k", "v"),
        Seq("k"), "v", Seq(0.5 -> "med", 0.9 -> "p90"))
      .collect().head
    assert(out.getAs[String]("med") ==
      sortedVals(math.ceil(400 * 0.5).toInt - 1))
    assert(out.getAs[String]("p90") ==
      sortedVals(math.ceil(400 * 0.9).toInt - 1))
  }

  test("100k URL-shaped values behind a 70-char shared prefix stay exact") {
    // Scale rehearsal of the LCP fix: the r8 kernel capped the prefix
    // scan at 64 chars, so this corpus — one key, every value sharing
    // a 70-char URL prefix, near-row-sized histogram — collapsed into
    // ONE bucket and ranked through a single task. With the exact LCP
    // (71 here: the prefix plus the shared leading '0' of the padded
    // ids) the digits right after it spread ~100 buckets. Values are
    // built plan-side; zero-padding makes lexicographic = numeric
    // order, so the expected quantiles are closed-form.
    val pre = "https://catalog.example-warehouse.com/categories/industrials/" +
      "products/" // 70 chars
    assert(pre.length == 70)
    val df = spark.range(100000).select(lit("k").as("k"),
      concat(lit(pre), format_string("%06d", col("id"))).as("v"))
    val t0 = System.nanoTime()
    val out = graft.Stats.exactPercentilesByKey(df, Seq("k"), "v",
        Seq(0.5 -> "med", 0.9 -> "p90"))
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.getAs[String]("med") == pre + "049999") // rank ceil(n/2)-1
    assert(out.getAs[String]("p90") == pre + "089999")
    assert(secs < 60.0, f"shared-prefix ranking took $secs%.1f s")
  }

  test("200 random multisets match naive references (numeric + string)") {
    import spark.implicits._
    // Property-style sweep in ONE kernel invocation: the kernel is
    // per-key, so each random case rides as its own key and one Spark
    // job checks all 200 (tie-heavy values from a small pool, random
    // sizes 1-60, planted nulls). Numeric compares against naive
    // linear interpolation in the same operation order (IEEE-exact);
    // strings against the sorted inverse-CDF rank max(ceil(n*p)-1, 0).
    val rnd = new scala.util.Random(1234)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val data = (0 until 200).map { k =>
      val n = 1 + rnd.nextInt(60)
      val vals = Seq.fill(n)(rnd.nextInt(20).toDouble)
      (s"k$k", vals)
    }
    val numRows = data.flatMap { case (k, vs) =>
      vs.map(v => (k, Some(v))) :+ (k, Option.empty[Double])
    }
    val numOut = graft.Stats.exactPercentilesByKey(
        numRows.toDF("k", "v"), Seq("k"), "v",
        ps.zipWithIndex.map { case (p, i) => p -> s"q$i" })
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getAs[Double](s"q$i"))).toMap
    data.foreach { case (k, vs) =>
      val s = vs.sorted
      val expect = ps.map { p =>
        val r = (s.size - 1) * p
        val (lo, hi) = (s(math.floor(r).toInt), s(math.ceil(r).toInt))
        lo + (r - math.floor(r)) * (hi - lo)
      }
      assert(numOut(k) == expect, s"numeric $k: ${numOut(k)} vs $expect")
    }
    val strRows = data.flatMap { case (k, vs) =>
      vs.map(v => (k, f"s${v.toInt}%02d"))
    }
    val strOut = graft.Stats.exactPercentilesByKey(
        strRows.toDF("k", "v"), Seq("k"), "v",
        ps.zipWithIndex.map { case (p, i) => p -> s"q$i" })
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getAs[String](s"q$i"))).toMap
    data.foreach { case (k, vs) =>
      val s = vs.map(v => f"s${v.toInt}%02d").sorted
      val expect = ps.map(p =>
        s(math.max(math.ceil(s.size * p).toInt - 1, 0)))
      assert(strOut(k) == expect, s"string $k: ${strOut(k)} vs $expect")
    }
  }

  test("narrow-range keys next to wide-range keys stay exact (per-key bins)") {
    import spark.implicits._
    // Key A occupies [0, 1] while key B spans [0, 1e9]: a GLOBAL
    // 256-bin anchor would put every A value in bucket 0 (the
    // single-task funnel); per-key anchors spread both. Correctness
    // must hold either way — this pins it alongside the per-key
    // bounds helper behavior.
    val rows = (0 until 1000).map(i => ("a", i / 999.0)) ++
      (0 until 1000).map(i => ("b", i * 1e6))
    val out = graft.Stats.exactPercentilesByKey(rows.toDF("k", "v"),
        Seq("k"), "v", Seq(0.5 -> "med", 0.9 -> "p90"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("med"), r.getAs[Double]("p90"))).toMap
    val a = (0 until 1000).map(_ / 999.0)
    def naive(s: Seq[Double], p: Double) = {
      val r = (s.size - 1) * p
      s(math.floor(r).toInt) +
        (r - math.floor(r)) * (s(math.ceil(r).toInt) - s(math.floor(r).toInt))
    }
    assert(out("a") == ((naive(a, 0.5), naive(a, 0.9))))
    val b = (0 until 1000).map(_ * 1e6)
    assert(out("b") == ((naive(b, 0.5), naive(b, 0.9))))
  }

  test("a planted NaN ranks last without poisoning the range bins") {
    import spark.implicits._
    // NaN is not null, max() calls it largest, and (v - mn)/NaN = NaN
    // would have collapsed ALL 256 bins into one before the round-9
    // fix; it now takes the dedicated top slot. Quantiles below the
    // NaN's rank stay exact under the NaN-sorts-last convention.
    val rows = (1 to 99).map(v => ("k", v.toDouble)) :+ ("k", Double.NaN)
    val out = graft.Stats.exactPercentilesByKey(rows.toDF("k", "v"),
        Seq("k"), "v", Seq(0.5 -> "med", 0.0 -> "lo"))
      .collect().head
    // n = 100 (NaN included), r = 49.5 -> between s(49)=50 and s(50)=51
    assert(out.getAs[Double]("med") == 50.5)
    assert(out.getAs[Double]("lo") == 1.0)
    // p = 1.0 lands ON the NaN, the faithful answer for max-with-NaN
    val hi = graft.Stats.exactPercentileByKey(rows.toDF("k", "v"),
        Seq("k"), "v", 1.0, "q")
      .collect().head.getAs[Double]("q")
    assert(hi.isNaN)
  }

  test("inverse-CDF rank survives upward fp error in n*p (ADVICE r8)") {
    import spark.implicits._
    // 100 * 0.07 = 7.000000000000001 in IEEE doubles: an unguarded
    // ceil lands on rank 7 instead of the mathematically-exact
    // ceil(7) - 1 = 6. DuckDB's quantile_disc returns rank 6.
    assert((100L * 0.07) > 7.0, "fixture must exercise the fp overshoot")
    val rows = (0 until 100).map(v => ("k", f"v$v%02d"))
    val out = graft.Stats.exactPercentileByKey(rows.toDF("k", "v"),
        Seq("k"), "v", 0.07, "q")
      .collect().head.getAs[String]("q")
    assert(out == "v06", s"rank ceil(7)-1=6 expected, got $out")
  }

  test("instant (non-NTZ) timestamps rank through unix_micros bucketing") {
    import spark.implicits._
    // The TimestampType branch projects unix_micros directly (no
    // session-zone cast involved: an instant's epoch is
    // timezone-independent by definition). Entries exercise NTZ (the
    // testdata convention), so this branch is spec-pinned here.
    val times = (0 until 10).map(i => f"2024-05-01 0$i:30:00")
    val df = times.toDF("s")
      .select(lit("k").as("k"), expr("cast(s as timestamp)").as("v"))
    val out = graft.Stats.exactPercentilesByKey(df, Seq("k"), "v",
        Seq(0.5 -> "med", 0.0 -> "lo", 1.0 -> "hi"))
      .select(expr("cast(med as string)"), expr("cast(lo as string)"),
        expr("cast(hi as string)"))
      .collect().head
    assert(out.getString(0) == "2024-05-01 04:30:00") // rank ceil(5)-1 = 4
    assert(out.getString(1) == "2024-05-01 00:30:00")
    assert(out.getString(2) == "2024-05-01 09:30:00")
  }

  test("the kernel is ANSI-safe on every bucketing path") {
    import spark.implicits._
    // Spark 4 defaults ANSI on; a public library kernel must not rely
    // on the permissive-mode sessions the oracle harness uses. Flip
    // ANSI for the numeric, string (LCP + substr), and NTZ field-
    // arithmetic paths and pin exact results.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val num = (0 until 101).map(v => ("k", v.toDouble)).toDF("k", "v")
      assert(graft.Stats.exactPercentileByKey(num, Seq("k"), "v", 0.5, "q")
        .collect().head.getAs[Double]("q") == 50.0)
      val str = (0 until 101).map(v => ("k", f"xx$v%03d")).toDF("k", "v")
      assert(graft.Stats.exactPercentileByKey(str, Seq("k"), "v", 0.5, "q")
        .collect().head.getAs[String]("q") == "xx050")
      val ntz = (0 until 10).map(i => f"2024-05-01 0$i:00:00").toDF("s")
        .select(lit("k").as("k"), expr("cast(s as timestamp_ntz)").as("v"))
      assert(graft.Stats.exactPercentileByKey(ntz, Seq("k"), "v", 0.5, "q")
        .select(expr("cast(q as string)")).collect().head.getString(0) ==
        "2024-05-01 04:00:00")
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  test("NTZ timestamps bucket timezone-independently (DST gap, ADVICE r8)") {
    import spark.implicits._
    // Wall-clock times inside America/New_York's 2021-03-14 02:00-03:00
    // spring-forward gap: a cast-through-session-tz projection maps
    // 02:30 PAST 03:00, mis-ordering the 256-bin buckets under a
    // non-UTC session. The field-arithmetic projection is identical
    // under any session timezone.
    val times = Seq(
      "2021-03-14 01:15:00", "2021-03-14 01:59:59",
      "2021-03-14 02:10:00", "2021-03-14 02:30:00",
      "2021-03-14 02:50:00", "2021-03-14 03:05:00",
      "2021-03-14 03:30:00", "2021-03-14 04:00:00",
      "2021-03-14 05:00:00", "2021-03-14 06:00:00")
    val df = times.toDF("s")
      .select(lit("k").as("k"), expr("cast(s as timestamp_ntz)").as("v"))
    def medians() = graft.Stats.exactPercentilesByKey(df, Seq("k"), "v",
        Seq(0.5 -> "med", 0.3 -> "p30"))
      .select(expr("cast(med as string)"), expr("cast(p30 as string)"))
      .collect().head
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val underUtc = try {
      spark.conf.set("spark.sql.session.timeZone", "UTC"); medians()
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    val underNy = try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      medians()
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // median of 10 = rank ceil(10*0.5)-1 = 4 (0-based) = 02:50;
    // p30 = rank 2 = 02:10 — both INSIDE the gap hour.
    assert(underUtc.getString(0) == "2021-03-14 02:50:00" &&
      underUtc.getString(1) == "2021-03-14 02:10:00")
    assert(underNy.getString(0) == underUtc.getString(0) &&
      underNy.getString(1) == underUtc.getString(1),
      s"projection must not depend on session tz: $underNy vs $underUtc")
  }
}
