package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is `private[sql]`,
  * so this one-file shim lives under the sql package to re-export the
  * two conversions the engine's custom expressions need. No other
  * Spark internals are touched. */
object ColumnBridgeImpl {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
