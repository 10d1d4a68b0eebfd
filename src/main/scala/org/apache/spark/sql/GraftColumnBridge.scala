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

  /** The column's value if it is a plain literal node (`lit(x)`), else
    * None — lets operators constant-fold degenerate argument shapes at
    * construction time (the ColumnNode `Literal` is private[sql], so
    * the peek lives in this shim). */
  def literalValue(c: Column): Option[Any] = c.node match {
    case internal.Literal(v, _, _) => Some(v)
    case _ => None
  }
}
