package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Weighted percentile as a [[TypedImperativeAggregate]] — the engine's
  * UDAF extension point with explicit state/update/merge/evaluate, the
  * contract of the reference's `Accumulator` ABC
  * (`/root/reference/python/datafusion/user_defined.py:358-706`) and its
  * `approx_percentile_cont_with_weight`
  * (`functions/__init__.py:5056` — no Spark builtin, SURVEY.md §7.3
  * item 7).
  *
  * Semantics: smallest value v such that the cumulative weight of rows
  * with value ≤ v reaches `pct × total_weight` (weighted lower
  * percentile). The default buffer holds exact (value, weight) pairs —
  * correct at any partitioning since merge concatenates and evaluate
  * sorts. With `sketch = true` (SQL `percentile_weighted_sketch`) the
  * buffer is bounded: whenever it overflows it is compacted into at most
  * [[WeightedPercentile.MaxCentroids]] (mean, weight) centroids using the
  * t-digest merge rule (adjacent absorption limited by the scale function
  * k(q) = δ/2π·asin(2q−1), which keeps tail centroids small) — the
  * 100 TB path, O(1) state per group behind the same four methods.
  * Sketch results are order-dependent like any t-digest; accuracy is
  * spec-bounded against exact mode, not bit-pinned.
  */
case class WeightedPercentile(
    valueExpr: Expression,
    weightExpr: Expression,
    pctExpr: Expression,
    sketch: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]] {
  import WeightedPercentile.{MaxCentroids, compress}

  override def children: Seq[Expression] = Seq(valueExpr, weightExpr, pctExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!pctExpr.foldable)
      TypeCheckResult.TypeCheckFailure("percentile must be a literal")
    else if (!children.take(2).forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("value and weight must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val pct: Double = pctExpr.eval() match {
    case d: Double => d
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  private def toDouble(a: Any): Double = a match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def update(buf: ArrayBuffer[(Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      val weight = toDouble(w)
      if (weight > 0) buf += ((toDouble(v), weight))
    }
    if (sketch && buf.length > MaxCentroids * 8) compress(buf) else buf
  }

  override def merge(buf: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    buf ++= other
    if (sketch && buf.length > MaxCentroids * 8) compress(buf) else buf
  }

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any =
    if (buf.isEmpty) null
    else {
      val sorted = buf.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val target = pct * total
      var cum = 0.0
      var result = sorted.last._1
      val it = sorted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= target) { result = v; found = true }
      }
      result
    }

  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (v, w) => bb.putDouble(v); bb.putDouble(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Double)](n)
    (0 until n).foreach(_ => buf += ((bb.getDouble, bb.getDouble)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): WeightedPercentile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): WeightedPercentile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1),
      pctExpr = newChildren(2))
  override def prettyName: String =
    if (sketch) "percentile_weighted_sketch" else "percentile_weighted"
}

object WeightedPercentile {
  /** Sketch-mode centroid budget (δ in t-digest terms). */
  val MaxCentroids = 128

  /** t-digest merge-compaction: sort by value, absorb neighbors into a
    * centroid while the k-scale span stays ≤ 1. Returns ≤ ~MaxCentroids
    * centroids; mean-weighted absorption keeps the weighted CDF accurate
    * to O(q(1−q)/δ). */
  private[graft] def compress(
      buf: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    if (buf.length <= MaxCentroids) return buf
    val sorted = buf.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    def k(q: Double): Double =
      MaxCentroids / (2 * math.Pi) *
        math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    val out = ArrayBuffer.empty[(Double, Double)]
    var cumBefore = 0.0
    var kLow = k(0.0)
    var cMean = sorted.head._1
    var cW = sorted.head._2
    sorted.iterator.drop(1).foreach { case (v, w) =>
      if (k((cumBefore + cW + w) / total) - kLow <= 1.0) {
        cMean = (cMean * cW + v * w) / (cW + w); cW += w
      } else {
        out += ((cMean, cW)); cumBefore += cW; kLow = k(cumBefore / total)
        cMean = v; cW = w
      }
    }
    out += ((cMean, cW))
    buf.clear()
    buf ++= out
  }

  def register(spark: SparkSession): Unit = {
    def builder(sketchMode: Boolean)(es: Seq[Expression]): Expression = {
      if (es.length != 3) throw new IllegalArgumentException(
        s"percentile_weighted expects (value, weight, pct), got ${es.length} arguments")
      WeightedPercentile(es(0), es(1), es(2), sketch = sketchMode)
        .toAggregateExpression()
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "percentile_weighted", builder(false), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "percentile_weighted_sketch", builder(true), "built-in")
  }
}
