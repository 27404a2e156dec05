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

object WindowKernels {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ema",
      es => {
        if (es.length != 2) throw new IllegalArgumentException(
          s"ema expects (column, alpha), got ${es.length} arguments")
        ExponentialMovingAverage(es.head, es(1))
      },
      "built-in")
}
