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

  /** Decompose a possibly sort-order Column (`col("x").desc`) into its
    * value column and direction (`true` = ascending). A plain column is
    * ascending — the same default `repartitionByRange`/`orderBy` apply.
    * Spark 4 wraps sort order in the internal ColumnNode layer, so this
    * lives in the bridge next to the other node accessors. */
  def sortOrder(c: Column): (Column, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      (Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Ascending)
    case _ => (c, true)
  }
}
