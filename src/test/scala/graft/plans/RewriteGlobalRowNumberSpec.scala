package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite must (a) fire — the optimized plan becomes a
  * broadcast join of two keyed windows, no global-order Window over
  * the data — and (b) be invisible in results: exact row_number values
  * on a total order, including a null leading key; untouched when the
  * pattern does not match or the flag is off.
  *
  * Runs in its OWN SparkSession (extensions bind at session build);
  * the shared sessions other suites hold are stopped first and
  * recreated lazily by their own `getOrCreate`.
  */
class RewriteGlobalRowNumberSpec extends AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    try f(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("global row_number rewrites to keyed windows with exact results") {
    withExtSession { spark =>
      import spark.implicits._
      val df = Seq((5, "a"), (3, "b"), (5, "c"), (1, "d"), (3, "e"),
        (2, null.asInstanceOf[String])).toDF("k", "s")
      val ranked = df.withColumn("rn",
        row_number().over(Window.orderBy(col("k").desc, col("s"))))
      val optimized = ranked.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Join"), s"rewrite did not fire:\n$optimized")
      // Expected: k desc, s asc (nulls first within equal k).
      val got = ranked.collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getInt(2)).toMap
      assert(got == Map((5, "a") -> 1, (5, "c") -> 2, (3, "b") -> 3,
        (3, "e") -> 4, (2, null) -> 5, (1, "d") -> 6))
    }
  }

  test("explicit NULLS LAST placement is preserved through the rewrite") {
    withExtSession { spark =>
      import spark.implicits._
      val df = Seq(Option(1), Option(2), Option.empty[Int]).toDF("k")
      val ranked = df.withColumn("rn",
        row_number().over(Window.orderBy(asc_nulls_last("k"))))
      assert(ranked.queryExecution.optimizedPlan.toString.contains("Join"))
      val got = ranked.collect()
        .map(r => Option(r.get(0)) -> r.getInt(1)).toMap
      assert(got == Map(Some(1) -> 1, Some(2) -> 2, None -> 3))
    }
  }

  test("partitioned row_number and non-ranking functions are untouched") {
    withExtSession { spark =>
      import spark.implicits._
      val df = Seq((1, 10), (1, 20), (2, 30)).toDF("g", "v")
      val part = df.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("v")))
      assert(!part.queryExecution.optimizedPlan.toString.contains("Join"))
      val nt = df.withColumn("nt",
        ntile(2).over(Window.partitionBy("g").orderBy("v")))
      assert(!nt.queryExecution.optimizedPlan.toString.contains("Join"))
      val lg = df.withColumn("lg",
        lag(col("v"), 1).over(Window.orderBy("v")))
      assert(!lg.queryExecution.optimizedPlan.toString.contains("Join"))
    }
  }

  test("global ntile rewrites; non-divisible n, ties, and nulls stay exact") {
    withExtSession { spark =>
      import spark.implicits._
      // 8 rows, buckets 3 (non-divisible: sizes 3/3/2), 5 (n mod b = 3)
      // and 16 (more buckets than rows: every row its own bucket, the
      // ⌊n/b⌋ = 0 branch-guard case). Ties are DUPLICATE rows, so the
      // multiset comparison is arrival-order independent the same way
      // the original nondeterministic ntile is.
      val df = Seq((5, "a"), (3, "b"), (5, "a"), (1, "d"), (3, "e"),
        (3, "b"), (2, null.asInstanceOf[String]),
        (2, null.asInstanceOf[String])).toDF("k", "s")
      for (b <- Seq(3, 5, 16)) {
        val w = Window.orderBy(col("k").desc, asc_nulls_last("s"))
        val q = df.withColumn("nt", ntile(b).over(w))
        assert(q.queryExecution.optimizedPlan.toString.contains("Join"),
          s"ntile($b) did not rewrite")
        def key(r: org.apache.spark.sql.Row) =
          (r.getInt(0), String.valueOf(r.getString(1)), r.getInt(2))
        val got = q.collect().map(key).sorted.toSeq
        spark.conf.set("spark.graft.rewriteGlobalRowNumber", "false")
        val exp = try {
          val p = df.withColumn("nt", ntile(b).over(w))
          assert(!p.queryExecution.optimizedPlan.toString.contains("Join"))
          p.collect().map(key).sorted.toSeq
        } finally spark.conf.unset("spark.graft.rewriteGlobalRowNumber")
        assert(got == exp, s"ntile($b): $got != $exp")
      }
      // NULLS FIRST leading key: the null rows take the first bucket.
      val nf = Seq(Option(1), Option(2), Option.empty[Int],
        Option.empty[Int]).toDF("k")
      val q = nf.withColumn("nt",
        ntile(2).over(Window.orderBy(asc_nulls_first("k"))))
      assert(q.queryExecution.optimizedPlan.toString.contains("Join"))
      val got = q.collect().map(r => Option(r.get(0)) -> r.getInt(1)).toSet
      assert(got == Set(None -> 1, Some(1) -> 2, Some(2) -> 2))
    }
  }

  test("global rank and dense_rank rewrite; ties and nulls stay exact") {
    withExtSession { spark =>
      import spark.implicits._
      // Ties on the full key (5,"a"), (3,"b") and a REPEATED null tie
      // (2,null) — rank must repeat-and-gap, dense_rank must count the
      // null-bearing key as one distinct value (the struct-distinct
      // histogram path; bare COUNT(DISTINCT) would drop it).
      val df = Seq((5, "a"), (3, "b"), (5, "a"), (1, "d"), (3, "e"),
        (3, "b"), (2, null.asInstanceOf[String]),
        (2, null.asInstanceOf[String])).toDF("k", "s")
      for (dense <- Seq(false, true)) {
        val fn = if (dense) dense_rank() else rank()
        val w = Window.orderBy(col("k").desc, asc_nulls_last("s"))
        val q = df.withColumn("rk", fn.over(w))
        assert(q.queryExecution.optimizedPlan.toString.contains("Join"),
          s"dense=$dense did not rewrite")
        def key(r: org.apache.spark.sql.Row) =
          (r.getInt(0), String.valueOf(r.getString(1)), r.getInt(2))
        val got = q.collect().map(key).sorted.toSeq
        spark.conf.set("spark.graft.rewriteGlobalRowNumber", "false")
        val exp = try {
          val p = df.withColumn("rk", fn.over(w))
          assert(!p.queryExecution.optimizedPlan.toString.contains("Join"))
          p.collect().map(key).sorted.toSeq
        } finally spark.conf.unset("spark.graft.rewriteGlobalRowNumber")
        assert(got == exp, s"dense=$dense: $got != $exp")
      }
    }
  }

  test("global percent_rank and cume_dist rewrite; doubles match bitwise") {
    withExtSession { spark =>
      import spark.implicits._
      // Ties on the full key, a repeated null key, and a two-column
      // order so the tie group differs from the leading-key bucket.
      val df = Seq((5, "a"), (3, "b"), (5, "a"), (1, "d"), (3, "e"),
        (3, "b"), (2, null.asInstanceOf[String]),
        (2, null.asInstanceOf[String])).toDF("k", "s")
      for (cume <- Seq(false, true)) {
        val fn = if (cume) cume_dist() else percent_rank()
        val w = Window.orderBy(col("k").desc, asc_nulls_last("s"))
        val q = df.withColumn("v", fn.over(w))
        assert(q.queryExecution.optimizedPlan.toString.contains("Join"),
          s"cume=$cume did not rewrite")
        def key(r: org.apache.spark.sql.Row) =
          (r.getInt(0), String.valueOf(r.getString(1)), r.getDouble(2))
        val got = q.collect().map(key).sorted.toSeq
        spark.conf.set("spark.graft.rewriteGlobalRowNumber", "false")
        val exp = try {
          val p = df.withColumn("v", fn.over(w))
          assert(!p.queryExecution.optimizedPlan.toString.contains("Join"))
          p.collect().map(key).sorted.toSeq
        } finally spark.conf.unset("spark.graft.rewriteGlobalRowNumber")
        // exact double equality — same operands, same IEEE division
        assert(got == exp, s"cume=$cume: $got != $exp")
      }
      // single-row edge: percent_rank must be 0.0, cume_dist 1.0
      val one = Seq(7).toDF("k")
      val pr = one.withColumn("v",
        percent_rank().over(Window.orderBy("k"))).collect()
      assert(pr.head.getDouble(1) == 0.0)
      val cd = one.withColumn("v",
        cume_dist().over(Window.orderBy("k"))).collect()
      assert(cd.head.getDouble(1) == 1.0)
    }
  }

  test("NULLS LAST leading key is preserved for rank and dense_rank") {
    withExtSession { spark =>
      import spark.implicits._
      val df = Seq(Option(1), Option(2), Option(2), Option.empty[Int],
        Option.empty[Int]).toDF("k")
      val rk = df.withColumn("r", rank().over(Window.orderBy(asc_nulls_last("k"))))
      assert(rk.queryExecution.optimizedPlan.toString.contains("Join"))
      val gotR = rk.collect().map(r => Option(r.get(0)) -> r.getInt(1)).toSet
      assert(gotR == Set(Some(1) -> 1, Some(2) -> 2, None -> 4))
      val dr = df.withColumn("r",
        dense_rank().over(Window.orderBy(asc_nulls_last("k"))))
      assert(dr.queryExecution.optimizedPlan.toString.contains("Join"))
      val gotD = dr.collect().map(r => Option(r.get(0)) -> r.getInt(1)).toSet
      assert(gotD == Set(Some(1) -> 1, Some(2) -> 2, None -> 3))
    }
  }

  test("the rewrite is exact under ANSI mode (Spark 4's user default)") {
    withExtSession { spark =>
      import spark.implicits._
      // User sessions default spark.sql.ansi.enabled=true in Spark 4;
      // the rewrite's arithmetic must neither error nor drift there.
      // ntile(16) over 8 rows exercises the ⌊n/b⌋ = 0 case, where the
      // If-guarded integral divide would throw DIVIDE_BY_ZERO under
      // ANSI if the guard ever evaluated the dead branch.
      spark.conf.set("spark.sql.ansi.enabled", "true")
      try {
        val df = Seq((5, "a"), (3, "b"), (5, "c"), (1, "d"), (3, "e"),
          (2, "f"), (4, "g"), (6, "h")).toDF("k", "s")
        val w = Window.orderBy(col("k").desc, col("s"))
        for ((name, fn) <- Seq[(String, org.apache.spark.sql.Column)](
            ("ntile16", ntile(16).over(w)),
            ("ntile3", ntile(3).over(w)),
            ("pct", percent_rank().over(w)),
            ("rn", row_number().over(w)))) {
          val q = df.withColumn("x", fn)
          assert(q.queryExecution.optimizedPlan.toString.contains("Join"),
            s"$name did not rewrite under ANSI")
          def key(r: org.apache.spark.sql.Row) =
            (r.getInt(0), r.getString(1), r.get(2).toString)
          val got = q.collect().map(key).sorted.toSeq
          spark.conf.set("spark.graft.rewriteGlobalRowNumber", "false")
          val exp = try df.withColumn("x", fn).collect().map(key).sorted.toSeq
          finally spark.conf.unset("spark.graft.rewriteGlobalRowNumber")
          assert(got == exp, s"$name under ANSI: $got != $exp")
        }
      } finally spark.conf.set("spark.sql.ansi.enabled", "false")
    }
  }

  test("nondeterministic child subtree is not rewritten") {
    withExtSession { spark =>
      import spark.implicits._
      // ORDER BY rand(): by optimizer time the sort expression is a
      // deterministic-looking attribute over a Project containing
      // rand() — the subtree guard must catch it (duplicating that
      // child under both join sides would corrupt the result). The
      // child must NOT be a LocalRelation: ConvertToLocalRelation
      // eagerly evaluates rand() into literal rows, after which the
      // subtree genuinely is deterministic and the rewrite is sound.
      val q = spark.range(16).toDF("v").withColumn("r", rand(7))
        .withColumn("rn", row_number().over(Window.orderBy("r")))
      assert(!q.queryExecution.optimizedPlan.toString.contains("Join"),
        "rewrite fired on a nondeterministic child")
      assert(q.collect().map(_.getInt(2)).sorted.toSeq == (1 to 16).toSeq)
    }
  }

  test("a LIMIT child (plan-level nondeterminism) is not rewritten") {
    withExtSession { spark =>
      import spark.implicits._
      // LIMIT without a defining sort picks an arbitrary row SET; the
      // duplicated child under the histogram and the ranked window
      // could materialize two different sets (pruned copies need not
      // hit ReuseExchange), so the guard must veto plan-level
      // nondeterminism, not just nondeterministic expressions.
      val q = spark.range(64).toDF("v").limit(16)
        .withColumn("rn", row_number().over(Window.orderBy("v")))
      assert(!q.queryExecution.optimizedPlan.toString.contains("Join"),
        "rewrite fired over a LIMIT child")
      assert(q.collect().map(_.getInt(1)).sorted.toSeq == (1 to 16).toSeq)
    }
  }

  test("an OFFSET child (plan-level nondeterminism) is not rewritten") {
    withExtSession { spark =>
      // OFFSET without a defining sort drops an arbitrary row PREFIX —
      // the same nondeterministic-row-set class as LIMIT/TABLESAMPLE
      // (round-9 review gap: the veto listed only those two).
      val q = spark.sql(
        "SELECT v, row_number() OVER (ORDER BY v) AS rn FROM " +
          "(SELECT id AS v FROM range(64) OFFSET 16)")
      assert(!q.queryExecution.optimizedPlan.toString.contains("Join"),
        "rewrite fired over an OFFSET child")
      assert(q.collect().map(_.getInt(1)).sorted.toSeq == (1 to 48).toSeq)
    }
  }

  test("the flag disables the rewrite") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set("spark.graft.rewriteGlobalRowNumber", "false")
      try {
        val df = Seq((1, "a"), (2, "b")).toDF("k", "s")
        val ranked = df.withColumn("rn",
          row_number().over(Window.orderBy("k")))
        assert(!ranked.queryExecution.optimizedPlan.toString.contains("Join"))
        assert(ranked.collect().map(_.getInt(2)).sorted.sameElements(Array(1, 2)))
      } finally spark.conf.unset("spark.graft.rewriteGlobalRowNumber")
    }
  }
}
