package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over `array<double>` columns (SURVEY.md §2.11
  * family, same construction as [[TailProbabilities]]).
  *
  * The Column-function formulation `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` evaluates an INTERPRETED lambda per element per row —
  * the known higher-order-function trap that already cost this repo
  * two regressions. This expression instead emits one static call
  * over the unsafe array data: a tight primitive loop, no per-element
  * closure dispatch, usable from Column code and (via [[register]])
  * SQL. Callers cast inputs to `array<double>` (the Column wrapper
  * below does it for them).
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over the shorter length; null elements contribute 0. */
  def dotArrays(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      dotArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorExpressions.dotArrays($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  private val dblArray = ArrayType(DoubleType)

  /** Column form; inputs coerced to `array<double>`. */
  def vec_dot(a: Column, b: Column): Column =
    column(DotProduct(
      expression(a.cast(dblArray)), expression(b.cast(dblArray))))

  /** Register `vec_dot` as a SQL function in a session. */
  def register(spark: SparkSession): Unit = {
    def d(e: Expression): Expression =
      if (e.dataType == dblArray) e else Cast(e, dblArray)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(d(exprs(0)), d(exprs(1))), "scala_udf")
  }
}
