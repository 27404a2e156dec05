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
  * changePrecision contributing null exactly as the non-ANSI Cast does.
  * Since round 19 the term rides [[GramDecimalSum.scaledLong]]'s
  * digit-parse to an unscaled long (with an explicit |term| < 10^p
  * replay of the precision gate — p here can be below a Long's 19
  * digits, unlike the Gram kernel's fixed 38) and the per-dimension
  * sums are exact integer adds that spill to java `BigDecimal` on
  * 64-bit overflow; both representations are exact at scale s, hence
  * order-free, matching Spark's decimal `sum` under any partitioning.
  * Counts replicate `count(*)` per
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

  override def createAggregationBuffer(): Buffer = new Buffer(0, scale)

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
          val sc = GramDecimalSum.scaledLong(x, scale)
          if (sc != Long.MinValue) {
            // the precision gate, replayed on the unscaled long: the
            // cast fails (null term) when the term needs more than
            // `precision` digits — reachable here because p can be < 19
            if (VectorDecimalStats.fitsPrecision(sc, precision))
              buf.addScaled(i, sc)
          } else {
            // scaled term outgrows a Long: original Decimal path
            val term = Decimal(x)
            if (term.changePrecision(precision, scale))
              buf.addBig(i, term.toJavaBigDecimal)
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
      if (other.big(i) != null) buf.addBig(i, other.big(i))
      else if (other.hasVal(i)) buf.addScaled(i, other.accL(i))
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
      if (buf.hasVal(i)) {
        sums(i) =
          if (buf.big(i) != null) {
            // decimal sum result semantics: overflow past (38, scale) -> null
            val dec = Decimal(buf.big(i))
            if (dec.changePrecision(38, scale)) dec else null
          } else
            // a Long-held sum has <= 19 digits: always fits (38, s)
            Decimal(buf.accL(i), 38, scale)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sums), new GenericArrayData(counts)))
  }

  // Serde format mirrors GramDecimalSum's: per dim a flag byte (bit1
  // has-value, bit2 spilled) + count long + 8-byte unscaled long or
  // length-prefixed BigInteger. Internal to one run's shuffle.
  override def serialize(buf: Buffer): Array[Byte] = {
    val parts = new Array[Array[Byte]](buf.dim)
    var total = 4
    var i = 0
    while (i < buf.dim) {
      if (buf.big(i) != null) {
        parts(i) = buf.big(i).unscaledValue().toByteArray
        total += 1 + 8 + 4 + parts(i).length
      } else if (buf.hasVal(i)) total += 1 + 8 + 8
      else total += 1 + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.dim)
    i = 0
    while (i < buf.dim) {
      val flags = ((if (buf.hasVal(i)) 2 else 0) |
        (if (parts(i) != null) 4 else 0)).toByte
      bb.put(flags)
      bb.putLong(buf.counts(i))
      if (parts(i) != null) {
        bb.putInt(parts(i).length)
        bb.put(parts(i))
      } else if (buf.hasVal(i)) bb.putLong(buf.accL(i))
      i += 1
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new Buffer(d, scale)
    var i = 0
    while (i < d) {
      val flags = bb.get()
      buf.hasVal(i) = (flags & 2) != 0
      buf.counts(i) = bb.getLong
      if ((flags & 4) != 0) {
        val len = bb.getInt
        val payload = new Array[Byte](len)
        bb.get(payload)
        buf.big(i) = new java.math.BigDecimal(
          new java.math.BigInteger(payload), scale)
      } else if (buf.hasVal(i)) buf.accL(i) = bb.getLong
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
  private val POW10: Array[Long] = Array.iterate(1L, 19)(_ * 10)

  /** `|unscaled| < 10^p` — whether a long-held term passes the cast's
    * precision-p gate (every long fits when p >= 19; `unscaled` is never
    * Long.MinValue, so the abs is safe). */
  private[graft] def fitsPrecision(unscaled: Long, p: Int): Boolean =
    p >= 19 || Math.abs(unscaled) < POW10(p)

  /** Growable per-dimension state: sums at the term scale (exact), and
    * posexplode-equivalent presence counts. Sum representation follows
    * [[GramDecimalSum.Buffer]]: an unscaled long per dimension
    * (`hasVal` marks a non-null sum) that spills to an exact
    * `BigDecimal` in `big` on 64-bit overflow — `big(i) != null`
    * implies `hasVal(i)`; both forms are exact at `scale`, so the spill
    * point never changes the final sum. */
  final class Buffer(initialDim: Int, val scale: Int) {
    var dim: Int = initialDim
    var accL: Array[Long] = new Array[Long](initialDim)
    var big: Array[java.math.BigDecimal] =
      new Array[java.math.BigDecimal](initialDim)
    var hasVal: Array[Boolean] = new Array[Boolean](initialDim)
    var counts: Array[Long] = new Array[Long](initialDim)

    def grow(d: Int): Unit = if (d > dim) {
      accL = java.util.Arrays.copyOf(accL, d)
      big = java.util.Arrays.copyOf(big, d)
      hasVal = java.util.Arrays.copyOf(hasVal, d)
      counts = java.util.Arrays.copyOf(counts, d)
      dim = d
    }

    /** Fold an unscaled-long term into dimension i. */
    def addScaled(i: Int, v: Long): Unit = {
      val b = big(i)
      if (b != null) big(i) = b.add(java.math.BigDecimal.valueOf(v, scale))
      else if (!hasVal(i)) { hasVal(i) = true; accL(i) = v }
      else {
        val a = accL(i)
        val s = a + v
        if (((a ^ s) & (v ^ s)) < 0)
          // 64-bit overflow: spill, re-doing this add exactly
          big(i) = java.math.BigDecimal.valueOf(a, scale)
            .add(java.math.BigDecimal.valueOf(v, scale))
        else accL(i) = s
      }
    }

    /** Fold a BigDecimal term (already at `scale`) into dimension i. */
    def addBig(i: Int, t: java.math.BigDecimal): Unit = {
      val b = big(i)
      if (b != null) big(i) = b.add(t)
      else if (hasVal(i))
        big(i) = java.math.BigDecimal.valueOf(accL(i), scale).add(t)
      else { hasVal(i) = true; big(i) = t }
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
