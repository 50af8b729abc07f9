package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column↔Expression converters, for
  * exposing custom Catalyst expressions as user-facing Columns (the
  * Spark-3 `new Column(expr)` / `col.expr` idiom was privatized in 4.x
  * by the Connect refactor). */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
