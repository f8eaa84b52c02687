package graft.bridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridgeImpl

/** Engine-side alias of the sql-package shim (see
  * org.apache.spark.sql.graftbridge.ColumnBridgeImpl). */
object ColumnBridge {
  def column(e: Expression): Column = ColumnBridgeImpl.column(e)
  def expression(c: Column): Expression = ColumnBridgeImpl.expression(c)
}
