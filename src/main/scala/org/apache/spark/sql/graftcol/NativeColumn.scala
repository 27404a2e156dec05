package org.apache.spark.sql.graftcol

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for graft's native kernels.
  *
  * Spark 4 backs `Column` with ColumnNode and gates the direct
  * expression wrappers behind `private[sql]` (`ExpressionUtils`,
  * columnNodeSupport.scala); this one-file shim — the same pattern as
  * [[org.apache.spark.sql.graftarrow.ArrowBridge]] — re-exports exactly
  * the two conversions, so kernels like
  * `graft.functions.MinHashSignature` can be used as Columns without a
  * per-session function-registry round-trip. */
object NativeColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
