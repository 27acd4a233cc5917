package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Catalyst Expression bridge.
 *
 * Spark 4 unified the Column API over ColumnNode and made the classic
 * converters `private[sql]`; this shim (in the org.apache.spark.sql
 * namespace, the sanctioned extension-library trick) re-exports just the
 * two conversions graft's custom expressions need.
 */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
