package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` onto ColumnNode (Connect unification) and scoped
  * the classic converters `private[sql]`. This bridge re-exports just the
  * two conversions a library needs to expose custom Catalyst expressions as
  * Columns — the standard extension-shim idiom (a package under
  * org.apache.spark.sql), no Spark internals modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
