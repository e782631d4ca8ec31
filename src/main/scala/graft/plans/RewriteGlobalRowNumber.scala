package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite a GLOBAL-order ranking window —
  * `row_number() | rank() | dense_rank() | percent_rank() |
  * cume_dist() | ntile(n) OVER (ORDER BY …)` with no PARTITION BY —
  * into the two-level ranking plan (see [[graft.Ranking]] for the
  * DataFrame-API statement of the same scheme and its exactness
  * conditions).
  *
  * Spark plans the original as a single-partition Window: every row of
  * the child funnels through ONE task — the canonical scale cliff, and
  * one Catalyst itself does not optimize. The rewrite replaces it with
  *
  *  1. a Window partitioned by the LEADING sort key (parallel, one
  *     hash shuffle) ranking within each key group,
  *  2. an Aggregate building the per-key histogram, a single-partition
  *     Window over that histogram (|distinct keys| rows, never the
  *     data) computing exclusive prefix offsets, and
  *  3. a broadcast join adding `offset + within-key rank`, cast back
  *     to the original IntegerType and re-aliased under the original
  *     exprId so parent plans resolve unchanged.
  *
  * Per function: `row_number`/`rank` offsets are per-bucket ROW counts
  * (a tie never crosses buckets — tied rows are equal on the full
  * order key, hence on its leading key, hence same bucket — so
  * `offset + within-bucket rank` is the global rank); `dense_rank`
  * offsets count DISTINCT full order keys per bucket (via a struct, so
  * null-bearing keys count as values the way dense_rank treats them,
  * unlike bare COUNT(DISTINCT) which would drop them); `percent_rank`
  * is the rank machinery finished as `(g_rank − 1)/(n − 1)` (0.0 for
  * n ≤ 1) and `cume_dist` a RANGE-frame count through the current tie
  * group finished as `(offset + count)/n` — with `n` read from one
  * extra unbounded-frame window expression over the SAME histogram
  * pass, and the divisions evaluating the identical operands Spark's
  * physical window functions divide, so the doubles agree bitwise;
  * `ntile(b)` is the row_number machinery finished as integer bin
  * arithmetic on the 0-based global position (first `n mod b` buckets
  * take `⌈n/b⌉` rows, the rest `⌊n/b⌋`), reading `n` from the same
  * histogram total.
  *
  * Result equivalence: exact when the full ORDER BY is a total order;
  * under ties the original row_number is itself nondeterministic
  * (partition-arrival order) and the rewrite is nondeterministic the
  * same way — within equal keys only (rank/dense_rank are
  * tie-deterministic and stay exact). Null leading keys group and rank
  * through the null-safe join, with the original's explicit NULLS
  * FIRST/LAST placement preserved in the histogram order. Skipped
  * unless the ENTIRE child subtree is deterministic — checking the
  * orderSpec alone is not enough, because by optimizer time
  * ExtractWindowExpressions has rewritten sort expressions into child
  * Project attributes, so `ORDER BY rand()` reaches this rule as a
  * deterministic-looking attribute whose producing Project is not;
  * duplicating such a child under both join sides would corrupt the
  * join. Disable with `spark.graft.rewriteGlobalRowNumber=false`.
  *
  * OUTPUT ORDER CHANGES: the original single-partition Window emits
  * rows physically sorted by the full ORDER BY; the rewrite's join
  * output order is arbitrary. Row-order-sensitive consumers (display,
  * limit-without-sort, streaming to an order-sensitive sink) must add
  * an explicit ORDER BY — which was always the only contractual way to
  * get ordered output.
  *
  * Cost caveats, deliberate: the child subtree appears under both the
  * ranked window and the histogram aggregate, so an expensive child
  * computes twice unless physical planning reuses the exchange — the
  * same trade the library's own self-join operators document; and for
  * a near-UNIQUE leading key the histogram approaches the data size,
  * where neither this shape nor the original single-partition window
  * is good (that query needs a coarser sort key or range partitioning;
  * the conf flag opts out).
  *
  * Registered via [[GraftExtensions]]
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`). The library's
  * own entries do not depend on it — they state the two-level plan
  * directly; the rule extends the same protection to ad-hoc user SQL.
  */
object RewriteGlobalRowNumber extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.rewriteGlobalRowNumber", "true")
        .toBoolean) {
      plan
    } else plan.transformUp {
      case Window(Seq(alias @ Alias(WindowExpression(fn,
            WindowSpecDefinition(Nil, orderSpec, _)), _)), Nil, _, child, _)
          if supported(fn) && orderSpec.nonEmpty &&
            orderSpec.forall(_.child.deterministic) &&
            subtreeDeterministic(child) =>
        rewrite(alias, fn, orderSpec, child)
    }

  private def supported(fn: Expression): Boolean = fn match {
    case _: RowNumber | _: Rank | _: DenseRank => true
    case _: PercentRank | _: CumeDist | _: NTile => true
    case _ => false
  }

  // The child subtree is duplicated under the ranked Window and the
  // histogram Aggregate; any nondeterministic expression anywhere in it
  // evaluates differently on each side and the key join silently drops
  // or mis-ranks rows. orderSpec determinism alone cannot see this —
  // the sort expression is an attribute by optimizer time. Expression
  // determinism alone cannot see PLAN-level nondeterminism either: a
  // LIMIT without a defining sort or a TABLESAMPLE materializes a
  // different row SET on each duplicated side (column pruning can give
  // the copies non-identical shuffles, defeating ReuseExchange), so
  // those operators veto the rewrite outright.
  private def subtreeDeterministic(p: LogicalPlan): Boolean =
    !p.exists {
      // Offset belongs with limit/sample: a bare OFFSET without a
      // defining sort drops a different row PREFIX on each duplicated
      // side — same class of plan-level nondeterminism.
      case _: GlobalLimit | _: LocalLimit | _: Sample | _: Offset => true
      case node => node.expressions.exists(_.exists(!_.deterministic))
    }

  private def rewrite(alias: Alias, fn: Expression,
      orderSpec: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    val k = orderSpec.head
    val rowFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    // Histogram of the leading key with exclusive running offsets. The
    // single-partition window here sees |distinct keys| rows only.
    // row_number/rank offset by preceding ROW counts; dense_rank by
    // preceding DISTINCT full-order-key counts (struct-wrapped so keys
    // containing nulls still count as distinct values).
    val bAlias = Alias(k.child, "__graft_bkt")()
    val cntAgg = fn match {
      case _: DenseRank =>
        Count(Seq(CreateStruct(orderSpec.map(_.child))))
          .toAggregateExpression(isDistinct = true)
      case _ => Count(Literal(1)).toAggregateExpression()
    }
    val cntAlias = Alias(cntAgg, "__graft_cnt")()
    val hist = Aggregate(Seq(k.child), Seq(bAlias, cntAlias), child)
    val bAttr = bAlias.toAttribute
    // Propagate the leading key's explicit null placement — building
    // SortOrder from the direction alone would silently reset
    // NULLS FIRST/LAST to the direction default and mis-rank every
    // bucket at or after the nulls.
    val histOrder = Seq(SortOrder(bAttr, k.direction, k.nullOrdering, Seq.empty))
    val sumAlias = Alias(WindowExpression(
      Sum(cntAlias.toAttribute).toAggregateExpression(),
      WindowSpecDefinition(Nil, histOrder,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))),
      "__graft_sum")()
    // percent_rank/cume_dist/ntile also need the TOTAL row count — one
    // more window expression over the same histogram pass (unbounded
    // frame), not a separate aggregate.
    val needsTotal = fn match {
      case _: PercentRank | _: CumeDist | _: NTile => true
      case _ => false
    }
    val totAlias = Alias(WindowExpression(
      Sum(cntAlias.toAttribute).toAggregateExpression(),
      WindowSpecDefinition(Nil, histOrder,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
          UnboundedFollowing))),
      "__graft_tot")()
    val offAlias = Alias(
      Coalesce(Seq(sumAlias.toAttribute, Literal(0L))), "__graft_off")()
    val histWindowed = Window(
      if (needsTotal) Seq(sumAlias, totAlias) else Seq(sumAlias),
      Nil, histOrder, hist, None)
    val offsets = Project(
      if (needsTotal) Seq(bAttr, offAlias, totAlias.toAttribute)
      else Seq(bAttr, offAlias),
      histWindowed)
    // Within-key rank over the data, keyed by the leading sort key.
    // The same function runs within buckets (rank/dense_rank need
    // their order children rebuilt to the tie order — physical
    // WindowExec reads frame-boundary changes off them). percent_rank
    // reduces to the RANK machinery ((g_rank − 1) / (n − 1));
    // cume_dist to a RANGE-frame count through the current tie group
    // (ties never cross buckets — equal on the full order key ⇒ equal
    // on its leading key).
    val tieOrder = if (orderSpec.tail.nonEmpty) orderSpec.tail else orderSpec
    val innerFn: Expression = fn match {
      case _: RowNumber | _: NTile => RowNumber()
      case _: Rank | _: PercentRank => Rank(tieOrder.map(_.child))
      case _: DenseRank => DenseRank(tieOrder.map(_.child))
      case _: CumeDist => Count(Literal(1)).toAggregateExpression()
    }
    val innerFrame = fn match {
      case _: CumeDist =>
        SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow)
      case _ => rowFrame
    }
    val rkAlias = Alias(WindowExpression(innerFn,
      WindowSpecDefinition(Seq(k.child), tieOrder, innerFrame)),
      "__graft_rk")()
    val ranked = Window(Seq(rkAlias), Seq(k.child), tieOrder, child, None)
    // No broadcast hint: the histogram's size is data-dependent (one
    // row per distinct leading key — tiny for grouped keys, data-sized
    // for near-unique ones). Let the planner/AQE pick broadcast vs
    // shuffle from its size estimate rather than forcing the broadcast.
    val joined = Join(ranked, offsets, Inner,
      Some(EqualNullSafe(k.child, bAttr)), JoinHint.NONE)
    // Global position: offset + within-bucket value, as a LONG.
    val globalPos = Add(offAlias.toAttribute,
      Cast(rkAlias.toAttribute, LongType))
    val resultChild: Expression = fn match {
      case _: PercentRank =>
        // Spark's PercentRank: (rank − 1) / (n − 1), 0.0 for n ≤ 1 —
        // identical operands, identical IEEE division.
        If(GreaterThan(totAlias.toAttribute, Literal(1L)),
          Divide(
            Cast(Subtract(globalPos, Literal(1L)), DoubleType),
            Cast(Subtract(totAlias.toAttribute, Literal(1L)), DoubleType)),
          Literal(0.0))
      case _: CumeDist =>
        // rows through the current tie group / n
        Divide(Cast(globalPos, DoubleType),
          Cast(totAlias.toAttribute, DoubleType))
      case nt: NTile =>
        // Spark's NTile over n rows and b buckets: the first
        // n mod b buckets take ⌈n/b⌉ rows, the rest ⌊n/b⌋ — pure
        // arithmetic on the 0-based global position (rn1) and the
        // histogram total, the same bin math as the deciles entry.
        // ⌊n/b⌋ = 0 (fewer rows than buckets) makes every row its own
        // bucket via the cutoff branch; the ⌊n/b⌋ divisor in the
        // other branch is then guarded behind the If, never evaluated.
        val b = Cast(nt.buckets, LongType)
        val n = totAlias.toAttribute
        val small = IntegralDivide(n, b)
        val rem = Remainder(n, b)
        val big = Add(small, Literal(1L))
        val cutoff = Multiply(rem, big)
        val rn1 = Subtract(globalPos, Literal(1L))
        Cast(
          If(LessThan(rn1, cutoff),
            Add(IntegralDivide(rn1, big), Literal(1L)),
            Add(Add(rem, IntegralDivide(Subtract(rn1, cutoff), small)),
              Literal(1L))),
          IntegerType)
      case _ => Cast(globalPos, IntegerType)
    }
    val rankExpr = Alias(resultChild,
      alias.name)(exprId = alias.exprId, qualifier = alias.qualifier,
        explicitMetadata = alias.explicitMetadata)
    Project(child.output :+ rankExpr, joined)
  }
}

/** Session-extension entry point registering the library's Catalyst
  * rules (`.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteGlobalRowNumber)
}
