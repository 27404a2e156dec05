package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Custom window function — the engine's UDWF extension point
  * (reference `udwf`/`WindowEvaluator`, user_defined.py:709-1104; SURVEY.md
  * §7.3 item 1). A `WindowEvaluator.evaluate(values, range)` in the
  * reference maps to a Catalyst [[AggregateWindowFunction]]-style running
  * state here: `initialValues`/`updateExpressions` play the evaluator's
  * per-row state transition, `evaluateExpression` its output. Being
  * declarative expressions, the state machine runs inside codegen — no
  * per-row JVM dispatch.
  *
  * `ema(x, alpha)`: exponential moving average over the window order,
  *   ema_1 = x_1; ema_i = alpha * x_i + (1 - alpha) * ema_{i-1}.
  */
case class ExponentialMovingAverage(child: Expression, alphaExpr: Expression)
  extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, alphaExpr)
  override def prettyName: String = "ema"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!alphaExpr.foldable)
      TypeCheckResult.TypeCheckFailure("ema alpha must be a literal")
    else if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"ema requires a numeric column, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val alpha: Double = alphaExpr.eval() match {
    case d: Double => d
    case d: Decimal => d.toDouble
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
  }

  private lazy val ema =
    AttributeReference("ema_state", DoubleType, nullable = true)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))
  /** Null semantics: a null input carries the previous state forward (the
    * average skips nulls) rather than nulling the state and restarting —
    * matching how the reference's sliding evaluators treat missing values. */
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(If(IsNull(x), ema,
      If(IsNull(ema), x,
        Add(Multiply(Literal(alpha), x), Multiply(Literal(1.0 - alpha), ema)))))
  }
  override lazy val evaluateExpression: Expression = ema

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), alphaExpr = newChildren(1))
}

/** `moving_sum(x, n)`: sliding n-row sum WITH RETRACTION, running inside
  * Spark's window executor — the reference's bounded `WindowEvaluator`
  * (`supports_bounded_execution`, user_defined.py:709-1104; retract wiring
  * `crates/core/src/udwf.rs:43-225`). Spark's executor has no retract hook
  * on user-specified sliding frames (its SlidingWindowFunctionFrame
  * rebuilds the buffer on every frame shift, O(rows × frame)), so the
  * function pins the RUNNING frame — processed incrementally, one update
  * per row — and performs the frame bookkeeping itself: the aggregation
  * buffer carries the exact decimal sum plus a ≤n-element ring of entered
  * values, and each update adds the entering value and subtracts the one
  * leaving the frame. O(rows) per partition, state O(n), all declarative
  * expressions (codegen-friendly), and semantically identical to
  * `sum(CAST(x AS DECIMAL)) OVER (ROWS BETWEEN n-1 PRECEDING AND CURRENT
  * ROW)` — asserted against both the DuckDB oracle and Spark's built-in
  * sliding frame in KernelsSpec.
  *
  * Null inputs contribute 0 but still occupy a frame slot (the frame
  * slides row-wise, as in SQL); the result is never null. */
case class MovingDecimalSumWindow(child: Expression, nExpr: Expression)
  extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def prettyName: String = "moving_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!nExpr.foldable)
      TypeCheckResult.TypeCheckFailure("moving_sum frame size must be a literal")
    else if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"moving_sum requires a numeric column, got ${child.dataType.simpleString}")
    else nExpr.eval() match {
      case i: Number if i.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"moving_sum frame size must be a positive integer, got $other")
    }

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()
  // scale 6 matches Q.dsum / the oracle's DECIMAL(30,6) cast; precision 38
  // keeps Add/Subtract closed over the same type
  private val dec = DecimalType(38, 6)
  private def zero: Expression = Cast(Literal(0.0d), dec)

  private lazy val sumA =
    AttributeReference("ms_sum", dec, nullable = true)()
  private lazy val ringA =
    AttributeReference("ms_ring", ArrayType(dec, containsNull = false))()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(sumA, ringA)

  override lazy val initialValues: Seq[Expression] = Seq(
    zero,
    Literal.create(Array.empty[Any], ArrayType(dec, containsNull = false)))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Coalesce(Seq(Cast(child, dec), zero))
    val full = GreaterThanOrEqual(
      Size(ringA, legacySizeOfNull = false), Literal(n))
    // retraction: the entering value is added, the value leaving the frame
    // (ring head, present once the ring holds n entries) is subtracted
    val leaving = If(full, GetArrayItem(ringA, Literal(0)), zero)
    val newSum = Subtract(Add(sumA, x), leaving)
    val kept = If(full, Slice(ringA, Literal(2), Literal(n - 1)), ringA)
    val newRing = Concat(Seq(kept, CreateArray(Seq(x))))
    Seq(Cast(newSum, dec), newRing)
  }

  override lazy val evaluateExpression: Expression = Cast(sumA, DoubleType)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object WindowKernels {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ema",
      es => {
        if (es.length != 2) throw new IllegalArgumentException(
          s"ema expects (column, alpha), got ${es.length} arguments")
        ExponentialMovingAverage(es.head, es(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "moving_sum",
      es => {
        if (es.length != 2) throw new IllegalArgumentException(
          s"moving_sum expects (column, frame_size), got ${es.length} arguments")
        MovingDecimalSumWindow(es.head, es(1))
      },
      "built-in")
  }
}
