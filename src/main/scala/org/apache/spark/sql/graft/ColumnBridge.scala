package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression conversions —
  * Spark 4 removed the public `new Column(expr)` constructor, and the engine
  * needs it exactly once: to wrap [[graft.functions.SparseWeightSum]] (an
  * expression carrying a non-Expression constructor arg, so it cannot go
  * through the FunctionRegistry / `call_function` route the other custom
  * expressions use). Lives under `org.apache.spark.sql` for access; keep it
  * to these two forwarders. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
