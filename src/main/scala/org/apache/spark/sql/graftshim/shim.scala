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

  /** Blocks until every queued listener event has been delivered (the
    * listener bus is async even in local mode), so a measurement
    * listener's counters are complete before they are read. Replaces
    * the fixed Thread.sleep drains in the bench/scale runners; the
    * bus reference is private[spark], hence the shim placement. */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
