package graft.functions

import java.math.{BigDecimal, RoundingMode}

/** The reference's full Accumulator contract — `state`/`update_batch`/
  * `merge_states`/`evaluate` *plus* `retract_batch`
  * (`/root/reference/python/datafusion/user_defined.py:358-706`, retract
  * wiring at `src/udaf.rs:119`). Retraction is what makes sliding-frame
  * aggregation O(rows) instead of O(rows × frame): when the frame start
  * advances, the leaving value is subtracted from the running state
  * instead of rebuilding the frame from scratch (which is what Spark's
  * own SlidingWindowFunctionFrame does for non-retractable aggregates).
  */
trait RetractableAccumulator[B, O] extends Serializable {
  def zero: B
  def update(b: B, v: Double): B
  /** Inverse of [[update]]: remove a previously-added value. */
  def retract(b: B, v: Double): B
  def merge(a: B, b: B): B
  def evaluate(b: B): O
}

/** Moving sum over an exact decimal state (scale 6, matching `Q.dsum`) —
  * BigDecimal add/subtract are exact, so retraction is bit-identical to
  * recomputing the frame, at any frame size and in any partition order.
  * Entry rounding pins DuckDB's `CAST(value AS DECIMAL(30,6))` exactly
  * (verified against DuckDB 1.0 on tie values): the double is multiplied
  * by 10^scale IN DOUBLE ARITHMETIC and the product rounded
  * half-away-from-zero (C `round()`), which is HALF_UP on the product's
  * exact binary value. [[MovingDecimalSumWindow]] uses the identical
  * conversion ([[DecimalEntry.toDec]]), so the two paths cannot diverge
  * on boundary inputs, and update/retract stay exact inverses. */
object MovingDecimalSum extends RetractableAccumulator[BigDecimal, Double] {
  private val SCALE = 6
  private def dec(v: Double): BigDecimal =
    new BigDecimal(v * 1e6).setScale(0, RoundingMode.HALF_UP)
      .movePointLeft(SCALE).setScale(SCALE)
  override def zero: BigDecimal = BigDecimal.ZERO.setScale(SCALE)
  override def update(b: BigDecimal, v: Double): BigDecimal = b.add(dec(v))
  override def retract(b: BigDecimal, v: Double): BigDecimal = b.subtract(dec(v))
  override def merge(a: BigDecimal, b: BigDecimal): BigDecimal = a.add(b)
  override def evaluate(b: BigDecimal): Double = b.doubleValue()
}
