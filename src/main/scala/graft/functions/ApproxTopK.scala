package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Approximate top-k heavy hitters as a [[TypedImperativeAggregate]] —
  * the Space-Saving sketch (Metwally, Agrawal & El Abbadi, "Efficient
  * computation of frequent and top-k elements in data streams", ICDT
  * 2005) behind the engine's UDAF extension point, the same accumulator
  * contract as the reference's `Accumulator` ABC and its approx
  * aggregate family (`python/datafusion/user_defined.py:358-706`,
  * `functions/__init__.py` `approx_distinct`/`approx_percentile_cont`).
  *
  * State is at most `capacity` counters `(item, count, max_err)`. Update:
  * a tracked item increments; an untracked item evicts the current
  * minimum counter and inherits its count as both estimate floor and
  * error bound. Merge sums per-item counts and error bounds across
  * partial sketches and re-trims to `capacity`, adding the dropped
  * minimum back into the surviving error bounds — the mergeable-summaries
  * merge (Agarwal et al., PODS 2012), which preserves the guarantee that
  * any item with true frequency > n/capacity survives and
  * `count − max_err ≤ true ≤ count`.
  *
  * At 100 TB this is THE frequency-analysis topology: O(capacity) state
  * per group flows through Spark's partial-aggregation machinery (map-side
  * partials, one shuffle of sketches — never of raw items). With
  * `capacity` ≥ the true distinct count no eviction ever happens, every
  * error is 0 and the result is exactly the global top-k regardless of
  * partitioning or merge order — which is what makes the registry entry
  * DuckDB-oracle-checkable while the small-capacity guarantee is
  * spec-bounded. Eviction scans the map for the minimum (O(capacity));
  * a production stream-summary keeps buckets in a doubly-linked list for
  * O(1) eviction — the state and guarantee are identical.
  */
case class ApproxTopK(
    child: Expression,
    kExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = Seq(child, kExpr, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_est", LongType),
    StructField("max_err", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k and capacity must be literals")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"approx_top_k tracks string items, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val capacity: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some((c, e)) => buf(item) = (c + 1, e)
        case None if buf.size < capacity => buf(item) = (1L, 0L)
        case None =>
          val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
          buf.remove(minItem)
          buf(item) = (minC + 1, minC)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    other.foreach { case (item, (c, e)) =>
      val (c0, e0) = buf.getOrElse(item, (0L, 0L))
      buf(item) = (c0 + c, e0 + e)
    }
    if (buf.size > capacity) {
      // trim to capacity: drop the smallest counters, folding the largest
      // dropped count into survivors' error bounds (a dropped item's
      // occurrences may be double-counted into a survivor on re-insert)
      val sorted = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
      val dropped = sorted.drop(capacity)
      val floor = dropped.head._2._1
      buf.clear()
      sorted.take(capacity).foreach { case (i, (c, e)) => buf(i) = (c, e + floor) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any]): ArrayData
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, (c, e)) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val i = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf(i) = (c, e)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1), capExpr = newChildren(2))
  override def prettyName: String = "approx_top_k"
}

object ApproxTopK {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "approx_top_k",
      es => {
        if (es.length != 3) throw new IllegalArgumentException(
          s"approx_top_k expects (item, k, capacity), got ${es.length} arguments")
        ApproxTopK(es(0), es(1), es(2)).toAggregateExpression()
      },
      "built-in")
}
