package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's package-private Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose
  * custom Catalyst expressions (e.g. graft's VecDot) as `Column`s.
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
