package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension exact-decimal sums and counts of a weighted vector
  * column, as one [[TypedImperativeAggregate]] — the fused form of the
  * `posexplode(v)` → `groupBy(pos).agg(sum(cast(x·w as decimal)),
  * count(*))` reduce the embedding-statistics family rode (covariance
  * per-dim sums, the power-iteration/PCA A-multiply, the isotropy
  * centroid): a d× row expansion and d hash-agg probes per row become
  * one buffer pass with d fused decimal adds.
  *
  * Bit-exactness: each term replays the engine's own
  * `cast(double AS decimal(p, s))` — [[Decimal]]`(x·w)` (shortest-repr
  * `Double.toString`) + `changePrecision(p, s)` (HALF_UP), a failed
  * changePrecision contributing null exactly as the non-ANSI Cast does —
  * and the per-dimension sums are java `BigDecimal.add`s at scale s,
  * which are EXACT and therefore order-free, matching Spark's decimal
  * `sum` under any partitioning. Counts replicate `count(*)` per
  * exploded position: every present element counts, null elements
  * count but contribute no sum (sum skips nulls). Ragged and empty
  * vectors are handled exactly as posexplode handles them — the buffer
  * grows to the longest vector seen and dimensions a row lacks are
  * simply not touched.
  *
  * Returns `struct<sums array<decimal(38, s)>, counts array<bigint>>`
  * (decimal sum result precision is `min(p+10, 38)` = 38 for these
  * callers); state is one d-length (BigDecimal, long) pair per group —
  * driver-sized bookkeeping, the IVF-centroid argument. */
case class VectorDecimalStats(
    vec: Expression,
    weight: Expression,
    precision: Int,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorDecimalStats.Buffer] {
  import VectorDecimalStats.Buffer

  override def children: Seq[Expression] = Seq(vec, weight)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_decimal_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DecimalType(38, scale), containsNull = true),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, weight.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        if (precision >= scale && scale >= 0 && precision <= 38)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: invalid decimal($precision, $scale)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got $other")
    }

  override def createAggregationBuffer(): Buffer = new Buffer(0)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    val w = weight.eval(input)
    buf.grow(d)
    var i = 0
    while (i < d) {
      buf.counts(i) += 1L
      // a null element (or null weight) makes the cast's operand null:
      // count(*) still counted the exploded row, sum skipped the null
      if (!arr.isNullAt(i) && w != null) {
        val x = arr.getDouble(i) * w.asInstanceOf[Double]
        // non-ANSI Cast: NaN/Inf and overflow -> null term, skipped by sum
        if (!java.lang.Double.isNaN(x) && !java.lang.Double.isInfinite(x)) {
          val term = Decimal(x)
          if (term.changePrecision(precision, scale)) {
            val s = buf.sums(i)
            buf.sums(i) =
              if (s == null) term.toJavaBigDecimal
              else s.add(term.toJavaBigDecimal)
          }
        }
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.dim == 0) return buf
    buf.grow(other.dim)
    var i = 0
    while (i < other.dim) {
      buf.counts(i) += other.counts(i)
      val o = other.sums(i)
      if (o != null) {
        val s = buf.sums(i)
        buf.sums(i) = if (s == null) o else s.add(o)
      }
      i += 1
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sums = new Array[Any](buf.dim)
    val counts = new Array[Long](buf.dim)
    var i = 0
    while (i < buf.dim) {
      counts(i) = buf.counts(i)
      if (buf.sums(i) != null) {
        // decimal sum result semantics: overflow past (38, scale) -> null
        val dec = Decimal(buf.sums(i))
        sums(i) = if (dec.changePrecision(38, scale)) dec else null
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sums), new GenericArrayData(counts)))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val parts = new Array[Array[Byte]](buf.dim)
    var total = 4
    var i = 0
    while (i < buf.dim) {
      parts(i) =
        if (buf.sums(i) == null) null
        else buf.sums(i).unscaledValue().toByteArray
      total += 8 + 8 + (if (parts(i) == null) 0 else parts(i).length)
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.dim)
    i = 0
    while (i < buf.dim) {
      bb.putLong(buf.counts(i))
      if (parts(i) == null) bb.putLong(-1L)
      else {
        bb.putLong(parts(i).length.toLong)
        bb.put(parts(i))
      }
      i += 1
    }
    // trim: the -1 null markers reserved 0 payload bytes
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new Buffer(d)
    var i = 0
    while (i < d) {
      buf.counts(i) = bb.getLong
      val len = bb.getLong
      if (len >= 0) {
        val payload = new Array[Byte](len.toInt)
        bb.get(payload)
        buf.sums(i) = new java.math.BigDecimal(
          new java.math.BigInteger(payload), scale)
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorDecimalStats =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorDecimalStats =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), weight = newChildren(1))
}

object VectorDecimalStats {
  /** Growable per-dimension state: sums at the term scale (exact), and
    * posexplode-equivalent presence counts. */
  final class Buffer(initialDim: Int) {
    var dim: Int = initialDim
    var sums: Array[java.math.BigDecimal] =
      new Array[java.math.BigDecimal](initialDim)
    var counts: Array[Long] = new Array[Long](initialDim)

    def grow(d: Int): Unit = if (d > dim) {
      sums = java.util.Arrays.copyOf(sums, d)
      counts = java.util.Arrays.copyOf(counts, d)
      dim = d
    }
  }

  /** Column builder: per-dimension `sum(cast(v[i]·w AS decimal(p, s)))`
    * and `count(*)` in one pass. */
  def vector_decimal_stats(v: Column, w: Column, precision: Int,
      scale: Int): Column =
    org.apache.spark.sql.graftcol.NativeColumn.column(
      VectorDecimalStats(
        org.apache.spark.sql.graftcol.NativeColumn.expression(v),
        org.apache.spark.sql.graftcol.NativeColumn.expression(w),
        precision, scale).toAggregateExpression())
}
