package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. `ExpressionUtils` is `private[sql]` in
  * Spark 4, so this one-file shim lives under `org.apache.spark.sql` —
  * the standard extension-library pattern for wrapping custom Catalyst
  * expressions into user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
