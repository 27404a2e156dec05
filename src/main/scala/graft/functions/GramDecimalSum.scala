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

/** Upper-triangle Gram accumulation of a float-vector column as ONE
  * [[TypedImperativeAggregate]] — the fused form of the covariance
  * operator's pair expansion + keyed decimal reduce
  * (`explode(pair_products(v))` → `groupBy(i, j).agg(sum(cast(xy AS
  * decimal(38, s))))`): instead of materializing and hash-aggregating
  * N·d(d−1)/2 pair rows, each partition folds every row's pair products
  * straight into a triangular (BigDecimal, seen) buffer and the merge
  * combines d(d−1)/2 cells once per partition. Per-ROW transient memory
  * is O(1) — no pair array, no tile explode — which supersedes the
  * tiled-Gram bound; the cost moves to per-PARTITION state, d(d−1)/2
  * cells (~16 KB at d=64, ~20 MB at d=1024 — the documented ceiling is
  * d ≈ 4096, beyond which partition state outgrows executor comfort and
  * the tiled explode plan remains the fallback).
  *
  * Bit-exactness, replayed term for term from the twin it fuses:
  * `xy = (double)v[i]·(double)v[j]` is the exact IEEE product the SQL
  * formulation computes; the term cast replays the engine's non-ANSI
  * `cast(double AS decimal(38, s))` ([[Decimal]]`(xy)` shortest-repr +
  * `changePrecision` HALF_UP, NaN/Inf/overflow → null term, skipped by
  * sum); per-cell accumulation is java `BigDecimal.add` at scale s —
  * EXACT, hence order-free, matching Spark's decimal `sum` under any
  * partitioning. Group-existence parity with the explode twin: a cell
  * is emitted iff some row produced the pair (both operands non-null —
  * pairs with a null operand are never emitted, so an all-null
  * dimension pair yields a MISSING row, exactly like
  * [[PairProducts]]); a cell whose every term cast to null (all-NaN)
  * is emitted with a null sum, exactly like `sum` over all-null.
  * Ragged vectors contribute only their own pairs — the buffer grows
  * to the longest vector seen.
  *
  * Returns `array<struct<i int, j int, sxy decimal(38, s)>>` ordered by
  * (j, i) ascending — consumers explode it and the cell order is
  * irrelevant to them. */
case class GramDecimalSum(
    vec: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramDecimalSum.Buffer] {
  import GramDecimalSum.Buffer

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_decimal_sum"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("sxy", DecimalType(38, scale), nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) =>
      if (scale >= 0 && scale <= 38) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: invalid scale $scale")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Buffer = new Buffer(0)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d < 2) return buf
    buf.grow(d)
    var i = 0
    while (i < d) {
      if (!arr.isNullAt(i)) {
        val xi = arr.getFloat(i).toDouble
        var j = i + 1
        while (j < d) {
          if (!arr.isNullAt(j)) {
            // cell (i+1, j+1), triangular index independent of d
            val idx = (j - 1) * j / 2 + i
            buf.seen(idx) = true
            val xy = xi * arr.getFloat(j).toDouble
            // non-ANSI Cast: NaN/Inf and overflow -> null term, skipped
            if (!java.lang.Double.isNaN(xy) &&
                !java.lang.Double.isInfinite(xy)) {
              val term = Decimal(xy)
              if (term.changePrecision(38, scale)) {
                val s = buf.sums(idx)
                buf.sums(idx) =
                  if (s == null) term.toJavaBigDecimal
                  else s.add(term.toJavaBigDecimal)
              }
            }
          }
          j += 1
        }
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.dim == 0) return buf
    buf.grow(other.dim)
    val cells = other.dim * (other.dim - 1) / 2
    var idx = 0
    while (idx < cells) {
      if (other.seen(idx)) buf.seen(idx) = true
      val o = other.sums(idx)
      if (o != null) {
        val s = buf.sums(idx)
        buf.sums(idx) = if (s == null) o else s.add(o)
      }
      idx += 1
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val out = new java.util.ArrayList[Any]()
    var j = 2
    while (j <= buf.dim) {
      var i = 1
      while (i < j) {
        val idx = (j - 2) * (j - 1) / 2 + (i - 1)
        if (buf.seen(idx)) {
          val sxy =
            if (buf.sums(idx) == null) null
            else {
              // decimal sum result semantics: overflow past (38, s) -> null
              val dec = Decimal(buf.sums(idx))
              if (dec.changePrecision(38, scale)) dec else null
            }
          out.add(new GenericInternalRow(Array[Any](i, j, sxy)))
        }
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val cells = buf.dim * (buf.dim - 1) / 2
    val parts = new Array[Array[Byte]](cells)
    var total = 4
    var idx = 0
    while (idx < cells) {
      parts(idx) =
        if (buf.sums(idx) == null) null
        else buf.sums(idx).unscaledValue().toByteArray
      total += 1 + 4 + (if (parts(idx) == null) 0 else parts(idx).length)
      idx += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.dim)
    idx = 0
    while (idx < cells) {
      bb.put(if (buf.seen(idx)) 1.toByte else 0.toByte)
      if (parts(idx) == null) bb.putInt(-1)
      else {
        bb.putInt(parts(idx).length)
        bb.put(parts(idx))
      }
      idx += 1
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new Buffer(d)
    val cells = d * (d - 1) / 2
    var idx = 0
    while (idx < cells) {
      buf.seen(idx) = bb.get() == 1.toByte
      val len = bb.getInt
      if (len >= 0) {
        val payload = new Array[Byte](len)
        bb.get(payload)
        buf.sums(idx) = new java.math.BigDecimal(
          new java.math.BigInteger(payload), scale)
      }
      idx += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramDecimalSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramDecimalSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object GramDecimalSum {
  /** Growable triangular state, cell (i, j) (1-based, i < j) at index
    * `(j−2)(j−1)/2 + (i−1)` — column-major by j, so growing the
    * dimension appends cells without relocating existing ones. */
  final class Buffer(initialDim: Int) {
    var dim: Int = initialDim
    private def cells(d: Int): Int = d * (d - 1) / 2
    var sums: Array[java.math.BigDecimal] =
      new Array[java.math.BigDecimal](cells(initialDim))
    var seen: Array[Boolean] = new Array[Boolean](cells(initialDim))

    def grow(d: Int): Unit = if (d > dim) {
      sums = java.util.Arrays.copyOf(sums, cells(d))
      seen = java.util.Arrays.copyOf(seen, cells(d))
      dim = d
    }
  }

  /** Column builder: `sum(cast(v[i]·v[j] AS decimal(38, s)))` over every
    * upper-triangle pair, in one pass, as array<struct<i, j, sxy>>. */
  def gram_decimal_sum(v: Column, scale: Int): Column =
    org.apache.spark.sql.graftcol.NativeColumn.column(
      GramDecimalSum(
        org.apache.spark.sql.graftcol.NativeColumn.expression(v),
        scale).toAggregateExpression())
}
