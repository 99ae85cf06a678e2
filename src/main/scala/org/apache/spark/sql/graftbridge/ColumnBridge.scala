package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4's Column is backed by a
  * ColumnNode (Connect split) and the classic converters are
  * `private[sql]`, so libraries that define native expressions expose
  * them through a small accessor in the sql package — the same pattern
  * Spark-ecosystem libraries (Delta, etc.) use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
