package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k by `(score DESC, id ASC)` as a
  * [[TypedImperativeAggregate]] — the map-side-combined replacement for
  * the `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`
  * window that every re-rank stage of the ANN/similarity family pays.
  *
  * The window formulation shuffles EVERY candidate row to its group's
  * partition and sorts the full candidate list there (for ANN re-ranks
  * that is |lists|·nProbe rows per query, parallelism bounded by the
  * number of query groups); this aggregate keeps at most k entries per
  * group per partition (partial aggregation — the combiner runs map-side
  * on each scan split), ships only those `k`-bounded buffers through one
  * exchange, and merges them. At 100 TB the shuffle volume drops from
  * the full candidate stream to `groups × partitions × k` structs, and
  * parallelism follows the scan, not the group count.
  *
  * Exactness contract (spec-pinned row-equal against the window twin):
  * the comparator replays Spark's window order `score DESC NULLS LAST,
  * id ASC` — doubles compare by `java.lang.Double.compare` (Spark's
  * DoubleType ordering: NaN above +Inf, −0.0 below +0.0), a null score
  * ranks below every non-null, ties fall to the smaller id with a null
  * id FIRST among score-ties (the window's default `id ASC NULLS
  * FIRST`). Top-k of a union equals top-k of per-part top-k's under a
  * total order, so merge order cannot change the result; `eval` emits
  * the k best entries best-first, and the caller's `posexplode`
  * position replays the window's `row_number`. Null ids are carried,
  * ranked, and emitted exactly as the window twin ranks them (round 16
  * — previously they were silently dropped, a divergence a future
  * caller with a nullable id column would have hit without any test
  * failing; current call sites derive ids from join keys and never
  * produce one). */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] {
  import TopKByScore.{Buffer, Entry}

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be double, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be bigint, got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val idV = idExpr.eval(input)
    val sV = scoreExpr.eval(input)
    buf.offer(new Entry(
      sV == null, if (sV == null) 0.0 else sV.asInstanceOf[Double],
      idV == null, if (idV == null) 0L else idV.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < other.size) { buf.offer(other.entries(i)); i += 1 }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      val e = buf.entries(i)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](if (e.scoreNull) null else e.score,
          if (e.idNull) null else e.id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 17)
    bb.putInt(buf.k)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      val e = buf.entries(i)
      // flags byte: bit 0 = score null, bit 1 = id null
      val flags = (if (e.scoreNull) 1 else 0) | (if (e.idNull) 2 else 0)
      bb.put(flags.toByte)
      bb.putDouble(e.score)
      bb.putLong(e.id)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val flags = bb.get()
      buf.offer(new Entry((flags & 1) != 0, bb.getDouble,
        (flags & 2) != 0, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}

object TopKByScore {
  /** `(score DESC NULLS LAST, id ASC NULLS FIRST)` rank key. */
  final class Entry(val scoreNull: Boolean, val score: Double,
      val idNull: Boolean, val id: Long) {
    def this(scoreNull: Boolean, score: Double, id: Long) =
      this(scoreNull, score, idNull = false, id)
  }

  /** true iff `a` ranks strictly before `b`. */
  private def before(a: Entry, b: Entry): Boolean = {
    if (a.scoreNull != b.scoreNull) return !a.scoreNull // non-null first
    if (!a.scoreNull) {
      // java.lang.Double.compare IS Spark's DoubleType ordering
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) return c > 0 // DESC
    }
    if (a.idNull != b.idNull) return a.idNull // id ASC NULLS FIRST
    a.id < b.id
  }

  /** Size-bounded sorted insert buffer: at most `k` entries, kept in
    * rank order (best first). `offer` is a linear insert — k is small
    * (re-rank depths) and entries past the current worst short-circuit
    * on one comparison, which is the common case once the buffer warms. */
  final class Buffer(val k: Int) {
    val entries = new Array[Entry](k)
    var size: Int = 0

    def offer(e: Entry): Unit = {
      if (k <= 0) return
      if (size == k && !before(e, entries(size - 1))) return
      var pos = if (size < k) size else size - 1
      // shift worse entries down; stop at the first entry ranking before e
      while (pos > 0 && before(e, entries(pos - 1))) {
        entries(pos) = entries(pos - 1)
        pos -= 1
      }
      entries(pos) = e
      if (size < k) size += 1
    }
  }

  /** Column builder for DataFrame use: exact top-k `(score DESC, id ASC)`
    * as `array<struct<score double, id bigint>>`, best first. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graftcol.NativeColumn.column(
      TopKByScore(
        org.apache.spark.sql.graftcol.NativeColumn.expression(score),
        org.apache.spark.sql.graftcol.NativeColumn.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
