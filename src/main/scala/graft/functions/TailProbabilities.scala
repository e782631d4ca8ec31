package graft.functions

import graft.claims.analytics.Distributions
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.TernaryExpression
import org.apache.spark.sql.types.{DataType, DoubleType}

/** SQL-surface wrappers for the sparse-track tail probabilities
  * (SURVEY.md §2.11 optional polish): native Catalyst expressions so
  * `poisson_tail(k, mu)` / `negbin_tail(k, mu, var)` are usable from
  * SQL and Column code alike. Codegen emits a direct static call into
  * the same Scala kernel the risk engine uses — no boxing, no UDF
  * registry indirection.
  */
object TailProbabilities {

  /** P(X ≥ k) for X ~ Poisson(mu) — the reference's
    * `1 - poisson.cdf(k-1, mu)` (core/analytics.py:124).
    */
  def upperTail(k: Double, mu: Double): Double =
    1.0 - Distributions.poissonCdf(k - 1, mu)

  /** P(X ≥ k) under the reference's NegBin parameterization from mean
    * and variance (core/analytics.py:117-120).
    */
  def negbinUpperTail(k: Double, mean: Double, variance: Double): Double = {
    val p = mean / variance
    val r = mean * p / (1.0 - p)
    1.0 - Distributions.nbinomCdf(k - 1, r, p)
  }

  case class PoissonTail(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(k: Any, mu: Any): Any =
      upperTail(k.asInstanceOf[Double], mu.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (k, mu) =>
        s"graft.functions.TailProbabilities.upperTail($k, $mu)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class NegbinTail(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(k: Any, mean: Any, variance: Any): Any =
      negbinUpperTail(k.asInstanceOf[Double], mean.asInstanceOf[Double],
        variance.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (k, m, v) =>
        s"graft.functions.TailProbabilities.negbinUpperTail($k, $m, $v)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  def poisson_tail(k: Column, mu: Column): Column =
    column(PoissonTail(expression(k.cast("double")), expression(mu.cast("double"))))

  def negbin_tail(k: Column, mean: Column, variance: Column): Column =
    column(NegbinTail(expression(k.cast("double")),
      expression(mean.cast("double")), expression(variance.cast("double"))))

  /** Register both as SQL functions in a session (arguments coerced to
    * double — SQL numeric literals arrive as Decimal).
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    def d(e: Expression): Expression =
      if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poisson_tail",
      exprs => PoissonTail(d(exprs(0)), d(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "negbin_tail",
      exprs => NegbinTail(d(exprs(0)), d(exprs(1)), d(exprs(2))), "scala_udf")
  }
}
