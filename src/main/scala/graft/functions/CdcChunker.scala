package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scanner as a native codegen'd
  * Catalyst expression.
  *
  * `cdc_boundaries(text)` returns the 1-based END positions of every
  * rolling-hash breakpoint: position `e = i + W` closes a chunk when the
  * polynomial hash of the W-char window starting at 1-based `i`
  * (Σ c_{i+j}·B^{W−1−j} mod P) is ≡ 0 (mod Mask). Semantically identical
  * to the HOF formulation it replaces (transform over sequence with an
  * 8-term linear expression per position), but the scan runs as one tight
  * generated JVM loop instead of ~8·len interpreted lambda evaluations
  * per document — the [[VectorKernel]] argument applied to the per-char
  * dedup hot path. Window/base/modulus/mask are the single source of
  * truth here; the DuckDB oracle SQL is generated from the same values.
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {
  override def prettyName: String = "cdc_boundaries"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CdcBoundaries.scan(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CdcBoundaries.scan($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  val Win = 8
  val P = 1000000007L
  val Mask = 64L
  val Base = 257L
  val Pow: Array[Long] =
    (0 until Win).scanLeft(1L)((acc, _) => acc * Base % P).take(Win).toArray

  /** The scan kernel: java-char (UTF-16 code unit) values, matching both
    * the former `ascii(split(text, ''))` formulation on this corpus and
    * the ScalaTest reference chunker's `text.map(_.toLong)`. Per-window
    * terms stay below 2^63 (65535 · P · W < 2^60), so one mod at the end
    * of each window suffices. */
  def scan(s: String): Array[Long] = {
    val n = s.length
    val last = n - Win
    if (last < 0) return Array.emptyLongArray
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var i = 0
    while (i <= last) {
      var h = 0L
      var j = 0
      while (j < Win) {
        h += s.charAt(i + j).toLong * Pow(Win - 1 - j)
        j += 1
      }
      if (h % P % Mask == 0L) out += (i + Win).toLong
      i += 1
    }
    out.result()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_boundaries",
      exprs => CdcBoundaries(exprs.head), "built-in")

  def cdc_boundaries(c: Column): Column =
    org.apache.spark.sql.functions.call_function("cdc_boundaries", c)
}
