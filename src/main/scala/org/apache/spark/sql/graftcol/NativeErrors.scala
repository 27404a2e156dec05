package org.apache.spark.sql.graftcol

import org.apache.spark.sql.errors.QueryExecutionErrors
import org.apache.spark.sql.types.Decimal

/** `private[sql]` error-constructor re-export (same pattern as
  * [[NativeColumn]]): lets graft's ANSI-faithful fast cast throw the
  * engine's own NUMERIC_VALUE_OUT_OF_RANGE SparkArithmeticException on
  * decimal-precision overflow, so an ANSI session sees the identical
  * failure the built-in `Cast` raises. */
object NativeErrors {
  def decimalPrecisionOverflow(value: Decimal, precision: Int, scale: Int)
      : ArithmeticException =
    QueryExecutionErrors.cannotChangeDecimalPrecisionError(
      value, precision, scale, null)
}
