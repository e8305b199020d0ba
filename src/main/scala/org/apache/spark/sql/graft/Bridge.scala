package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge for Spark 4.x, where `Column` is node-based
  * and the classic converters are `private[sql]`. Lives in a subpackage of
  * org.apache.spark.sql solely to reach them; contains no logic. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → catalyst Expression via the same converter the classic
    * Dataset API applies. Unlike [[expression]] — which wraps the column's
    * node tree in one opaque `ColumnNodeExpression` leaf that only the
    * DataFrame path later unwraps — this produces a real catalyst tree
    * (UnresolvedFunction etc.) that the ANALYZER resolves, so it is the
    * right form for SQL `FunctionRegistry` builders. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
