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
  * Entry rounding mirrors DuckDB's `CAST(value AS DECIMAL(30,6))` exactly:
  * the EXACT binary value of the double (not its shortest decimal string)
  * rounded half-away-from-zero — so inputs landing on a x.xxxxxx5 boundary
  * round the same on both sides, and update/retract stay exact inverses. */
object MovingDecimalSum extends RetractableAccumulator[BigDecimal, Double] {
  private val SCALE = 6
  private def dec(v: Double): BigDecimal =
    new BigDecimal(v).setScale(SCALE, RoundingMode.HALF_UP)
  override def zero: BigDecimal = BigDecimal.ZERO.setScale(SCALE)
  override def update(b: BigDecimal, v: Double): BigDecimal = b.add(dec(v))
  override def retract(b: BigDecimal, v: Double): BigDecimal = b.subtract(dec(v))
  override def merge(a: BigDecimal, b: BigDecimal): BigDecimal = a.add(b)
  override def evaluate(b: BigDecimal): Double = b.doubleValue()
}
