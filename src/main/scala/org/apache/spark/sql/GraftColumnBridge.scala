package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-mode Column <-> catalyst Expression bridge.
  *
  * Spark 4 made the public Column API backend-agnostic (ColumnNode), and
  * the classic converters (`org.apache.spark.sql.classic.ExpressionUtils`)
  * are `private[sql]` — so a library registering its own Catalyst
  * expressions (graft.functions.RollingHash) needs this one-file shim in
  * the sql package namespace. No Spark internals are re-implemented here.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
