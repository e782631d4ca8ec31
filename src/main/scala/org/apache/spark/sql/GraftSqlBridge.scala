package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-private Column ↔ Expression converters —
  * the standard escape hatch third-party Catalyst extensions use to
  * expose native expressions as `Column`s (the public API in Spark 4
  * only converts via the function registry).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]`; expressions outside the
    * spark.sql package alias it here to declare `inputTypes`.
    */
  type GraftAbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
