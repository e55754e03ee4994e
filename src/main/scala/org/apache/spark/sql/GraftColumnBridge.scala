package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `Column`-from-`Expression` constructor, which
  * moved behind `private[sql] classic.ExpressionUtils` when the Column
  * API was abstracted over ColumnNode. Needed for expressions that
  * carry non-SQL-expressible constructor state (e.g. a `Broadcast`
  * handle in [[graft.functions.MaxCosineSimBc]]) and therefore cannot
  * be routed through `FunctionRegistry` temp-function builders like the
  * rest of graft's native expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
