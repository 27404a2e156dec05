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

/** Double → DECIMAL(38,6) entry conversion shared by both moving-sum
  * paths, pinning DuckDB's `CAST(double AS DECIMAL(p,6))` semantics
  * (duckdb 1.0, verified on tie values): multiply by 10^6 IN DOUBLE
  * ARITHMETIC, round the product half-away-from-zero (C `round()`).
  * Spark's own `Cast` instead rounds the SHORTEST decimal string of the
  * double (`Decimal(double)` goes through `Double.toString`), which
  * disagrees with DuckDB on boundary doubles — e.g. the double nearest
  * 0.1234565 is 0.12345649999…, whose product 123456.5 rounds to
  * .123457 in DuckDB but whose short string rounds to .123457 while the
  * exact binary value rounds to .123456. One conversion, used by both
  * the window kernel and the flatMapGroups accumulator, keeps the twin
  * paths and the oracle bit-identical. */
object DecimalEntry {
  val SCALE = 6

  /** Round the EXACT binary value of `w` to an integer, half away from
    * zero, in pure integer arithmetic — what
    * `new java.math.BigDecimal(w).setScale(0, HALF_UP)` computes (r19:
    * ~10 ns vs the exact-expansion BigDecimal's ~100+ ns; the binary
    * value is the rounding target, so unlike the shortest-string cast
    * there is no ambiguity margin and no fallback band). Returns
    * `Long.MinValue` for non-finite or |rounded| beyond a Long, sending
    * the caller to the original BigDecimal path (which also owns the
    * NaN throw the original semantics had). Property-pinned against the
    * BigDecimal model in KernelPropertySpec. */
  private def roundHalfAwayExact(w: Double): Long = {
    if (!java.lang.Double.isFinite(w)) return Long.MinValue
    val bits = java.lang.Double.doubleToRawLongBits(w)
    val neg = bits < 0
    val e = ((bits >>> 52) & 0x7ff).toInt
    val f = bits & 0x000fffffffffffffL
    val m = if (e > 0) f | (1L << 52) else f
    if (m == 0L) return 0L // ±0.0
    val k = if (e > 0) e - 1075 else -1074
    if (k >= 0) { // integral value m·2^k
      if (k > 62 || m > (Long.MaxValue >> k)) return Long.MinValue
      val i = m << k
      if (neg) -i else i
    } else {
      val s = -k
      if (s >= 64) 0L // |w| < 2^53 · 2^-64 < 0.5 → rounds to zero
      else {
        val i = m >>> s
        val rem = m & ((1L << s) - 1)
        // exact fractional part is rem/2^s: half-away rounds up iff
        // rem >= 2^(s-1) (s=63 ⇒ i=0, rem=m < 2^62 ⇒ 0 — no overflow)
        val r = if (rem >= (1L << (s - 1))) i + 1 else i
        if (neg) -r else r
      }
    }
  }

  def toDec(v: Double): org.apache.spark.sql.types.Decimal = {
    val w = v * 1e6
    val u = roundHalfAwayExact(w)
    if (u != Long.MinValue)
      org.apache.spark.sql.types.Decimal(u, 38, SCALE)
    else { // non-finite (throws, as before) or beyond-Long magnitudes
      val jbd = new java.math.BigDecimal(w)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .movePointLeft(SCALE)
      org.apache.spark.sql.types.Decimal(jbd, 38, SCALE)
    }
  }
}

/** [[DecimalEntry.toDec]] as a codegen'd Catalyst expression (null in →
  * null out), so the window kernel's state machine stays inside
  * whole-stage-generated projections. */
case class DuckDoubleToDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, DecimalEntry.SCALE)
  override def prettyName: String = "duck_double_to_decimal"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires DOUBLE input, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    DecimalEntry.toDec(input.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DecimalEntry.toDec($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `moving_sum(x, n)`: sliding n-row sum WITH RETRACTION, running inside
  * Spark's window executor — the reference's bounded `WindowEvaluator`
  * (`supports_bounded_execution`, user_defined.py:709-1104; retract wiring
  * `crates/core/src/udwf.rs:43-225`). Spark's executor has no retract hook
  * on user-specified sliding frames (its SlidingWindowFunctionFrame
  * rebuilds the buffer on every frame shift, re-accumulating n values per
  * row), so the function pins the RUNNING frame — processed incrementally,
  * one update per row — and performs the frame bookkeeping itself: the
  * aggregation buffer carries the exact decimal sum, a ≤n-element ring of
  * entered values, and the count of non-null frame entries; each update
  * adds the entering value and subtracts the one leaving the frame.
  * Cost per row: O(1) arithmetic (one add + one subtract, vs the n adds
  * of a frame rebuild) and O(n) ring maintenance (the Slice+Concat copy)
  * — so O(rows × n) state copying total, with n expected small; the win
  * over the rebuild is the constant-factor arithmetic, not the copy.
  * All declarative expressions (codegen-friendly), and semantically
  * identical to `sum(CAST(x AS DECIMAL)) OVER (ROWS BETWEEN n-1 PRECEDING
  * AND CURRENT ROW)` — asserted against both the DuckDB oracle and
  * Spark's built-in sliding frame in KernelsSpec.
  *
  * Null semantics match SQL `sum` over the same frame: a null input
  * occupies a frame slot (the frame slides row-wise) but contributes
  * nothing, and a frame containing only nulls evaluates to NULL. */
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
    AttributeReference("ms_ring", ArrayType(dec, containsNull = true))()
  private lazy val cntA =
    AttributeReference("ms_cnt", LongType, nullable = false)()
  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumA, ringA, cntA)

  override lazy val initialValues: Seq[Expression] = Seq(
    zero,
    Literal.create(Array.empty[Any], ArrayType(dec, containsNull = true)),
    Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    // entry conversion pinned to DuckDB cast semantics; null stays null so
    // the ring remembers which slots hold no value
    val xRaw = DuckDoubleToDecimal(Cast(child, DoubleType))
    val x = Coalesce(Seq(xRaw, zero))
    val full = GreaterThanOrEqual(
      Size(ringA, legacySizeOfNull = false), Literal(n))
    // retraction: the entering value is added, the value leaving the frame
    // (ring head, present once the ring holds n entries) is subtracted
    val leavingRaw = GetArrayItem(ringA, Literal(0))
    val leaving = If(full, Coalesce(Seq(leavingRaw, zero)), zero)
    val newSum = Subtract(Add(sumA, x), leaving)
    val kept = If(full, Slice(ringA, Literal(2), Literal(n - 1)), ringA)
    val newRing = Concat(Seq(kept, CreateArray(Seq(xRaw))))
    val entering = If(IsNull(xRaw), Literal(0L), Literal(1L))
    val exiting = If(And(full, IsNotNull(leavingRaw)), Literal(1L), Literal(0L))
    val newCnt = Subtract(Add(cntA, entering), exiting)
    Seq(Cast(newSum, dec), newRing, newCnt)
  }

  override lazy val evaluateExpression: Expression =
    If(GreaterThan(cntA, Literal(0L)),
      Cast(sumA, DoubleType), Literal.create(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

/** `cusum_pos(x, k)`: one-sided positive CUSUM over the window order —
  * s_1 = max(0, x_1 − k); s_i = max(0, s_{i−1} + x_i − k) — the control-
  * chart recursion for upward-shift detection (Page 1954). The negative
  * side needs no second kernel: it is `cusum_pos(-x, k)`. Declarative
  * state machine (one Greatest/Add per row) so it runs inside codegen,
  * like [[ExponentialMovingAverage]]. Null inputs carry the state
  * forward unchanged. */
case class CusumPositive(child: Expression, kExpr: Expression)
  extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def prettyName: String = "cusum_pos"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("cusum_pos slack k must be a literal")
    else if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"cusum_pos requires a numeric column, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Double = kExpr.eval() match {
    case d: Double => d
    case d: Decimal => d.toDouble
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
  }

  private lazy val s =
    AttributeReference("cusum_state", DoubleType, nullable = false)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0))
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(If(IsNull(x), s,
      Greatest(Seq(Literal(0.0), Add(s, Subtract(x, Literal(k)))))))
  }
  override lazy val evaluateExpression: Expression = s

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object WindowKernels {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cusum_pos",
      es => {
        if (es.length != 2) throw new IllegalArgumentException(
          s"cusum_pos expects (column, k), got ${es.length} arguments")
        CusumPositive(es.head, es(1))
      },
      "built-in")
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
