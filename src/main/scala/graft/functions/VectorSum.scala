package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of `array<double>` vectors as a
  * [[TypedImperativeAggregate]] — the k-means/IVF update's keyed reduce
  * without the positional explode.
  *
  * The Lloyd update previously rode `posexplode(v)` +
  * `groupBy(cid, pos).avg(x)`: a d× row expansion feeding d·n hash-agg
  * probes per iteration. This aggregate keeps the reduction shape
  * (map-side partial vectors, one k×d-bounded shuffle, driver-sized
  * result) but does one buffer lookup + d fused adds per ROW instead of
  * d lookups — the per-row cost drops from d hash probes to one.
  *
  * Bit-exactness with the avg formulation it replaces: per partition,
  * rows arrive in the same scan order and each dimension accumulates by
  * the same sequential `+=`; per group, partial buffers merge in the
  * same order the per-dimension partial sums merged; and the caller's
  * driver-side `sv(i) / n` is the same single IEEE division
  * `Average` performs at eval — so the trained centroids are
  * bit-identical to the posexplode/avg plan's (spec-pinned in
  * LearnSpec). State is one d-length double array per group — driver
  * bookkeeping at 100 TB just like the centroid table itself.
  * Dimension mismatches THROW (the [[VectorKernel]] posture); null
  * vectors are skipped like `avg` skips null inputs. */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] =
    Array.emptyDoubleArray // dimension fixed by the first observed vector

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val acc = if (buf.isEmpty) new Array[Double](d) else buf
    if (acc.length != d) throw new IllegalArgumentException(
      s"$prettyName: vector length mismatch: ${acc.length} vs $d")
    var i = 0
    while (i < d) { acc(i) += arr.getDouble(i); i += 1 }
    acc
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    if (buf.length != other.length) throw new IllegalArgumentException(
      s"$prettyName: vector length mismatch: ${buf.length} vs ${other.length}")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorSum {
  /** Column builder for DataFrame use. */
  def vector_sum(c: Column): Column =
    org.apache.spark.sql.graftcol.NativeColumn.column(
      VectorSum(org.apache.spark.sql.graftcol.NativeColumn.expression(c))
        .toAggregateExpression())
}
