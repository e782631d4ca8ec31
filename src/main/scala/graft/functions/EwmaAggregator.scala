package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** `ewma(ord, value, alpha)` as a typed [[Aggregator]] registered for
  * SQL — the order-sensitive exponentially-weighted mean (pandas
  * `ewm(alpha).mean().iloc[-1]` with `adjust=False`, the recursion the
  * risk engine uses at RiskScoringEngine.ewmaScore; reference:
  * core/analytics.py:281-283) exposed as a grouped SQL function.
  *
  * EWMA cannot be a plain commutative aggregate: the result depends on
  * observation order, while Spark feeds aggregation buffers in
  * partition order. The Aggregator therefore buffers (ord, value)
  * pairs and resolves the order ONCE in `finish` — making the result
  * invariant to row order and partitioning (spec-checked under
  * repartition/shuffle). Buffers are bounded by the group's row count;
  * the intended inputs are per-key monthly series (≤ a few hundred
  * rows), the same contract as the risk kernels. `alpha` rides along
  * per row because SQL UDAF arguments are columns; it must be constant
  * within a group (first value wins).
  */
object EwmaAggregator {

  type In = (Long, Double, Double)

  val agg: Aggregator[In, List[In], Double] =
    new Aggregator[In, List[In], Double] {
      def zero: List[In] = Nil
      def reduce(b: List[In], a: In): List[In] = a :: b
      def merge(b1: List[In], b2: List[In]): List[In] = b1 ::: b2
      // Full-tuple sort: sorting by ord alone would leave rows with
      // DUPLICATE ord values in partition-arrival order, making the
      // result (and the chosen alpha) nondeterministic under shuffle —
      // the exact nondeterminism the sort exists to prevent.
      def finish(b: List[In]): Double = b.sorted match {
        case Nil => Double.NaN
        // alpha from the SORTED head — "first value wins" must mean
        // first by ord, not first by partition arrival, or a
        // non-constant alpha column would make the result depend on
        // shuffle order (the exact nondeterminism the sort exists to
        // prevent).
        case (_, v0, a0) :: rest =>
          rest.foldLeft(v0) { case (e, (_, x, _)) =>
            (1 - a0) * e + a0 * x
          }
      }
      // array-of-struct buffer column; bounded by the group's row count
      def bufferEncoder: Encoder[List[In]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[In]]()
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Register as SQL function `ewma(ord, value, alpha)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("ewma", org.apache.spark.sql.functions.udaf(agg))
}
