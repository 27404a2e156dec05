package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
  * algorithm) as a native codegen'd Catalyst expression.
  *
  * `winnow_fps(ws)` = the DISTINCT selected fingerprints of the word
  * array: hash every K-word gram to its md5 60-bit lane (first 15 hex
  * nibbles — the repo-wide cross-engine idiom), slide a W-gram window,
  * and keep a gram's hash iff it equals the window minimum at a
  * position where the window is full (1-based p ≥ W). Selection is a
  * pure per-document function; the previous formulation paid a per-doc
  * gram explode, a doc-keyed window sort, and a distinct shuffle before
  * the pair join — this kernel runs it as one generated loop per
  * document, so the operator is scan-shaped until the honest
  * fingerprint-equality pair stage. Bit-identical to the SQL chain
  * (same gram join with ' ', same md5 lane, same ROWS window and
  * h = min tie semantics — EVERY position whose hash equals the window
  * minimum selects, duplicates collapsed by the trailing distinct,
  * which the in-loop hash set reproduces). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: select() reads each element's UTF8String
    // unconditionally (call sites pass split() output, which never holds
    // nulls), so a null-bearing array type is rejected at analysis time
    // rather than NPE-ing at execution.
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.select(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  def select(ws: ArrayData, k: Int, w: Int): GenericArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val ng = n - k + 1
    val digest = MinHashSignature.md5Digest()
    val hs = new Array[Long](ng)
    var p = 0
    while (p < ng) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(ws.getUTF8String(p + j).toString)
        j += 1
      }
      hs(p) = MinHashSignature.hexPrefix15(
        digest.digest(sb.toString.getBytes(StandardCharsets.UTF_8)))
      p += 1
    }
    // full windows only (1-based p ≥ w): select h where h == window min
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    p = w - 1
    while (p < ng) {
      var mh = Long.MaxValue
      var q = p - w + 1
      while (q <= p) { if (hs(q) < mh) mh = hs(q); q += 1 }
      if (hs(p) == mh) seen.add(hs(p))
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
