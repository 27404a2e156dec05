package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RAKE top-3 keyphrase extraction as a native codegen'd Catalyst
  * expression.
  *
  * `rake_top3(text)` = the document's three highest-scoring RAKE
  * keyphrases as (phrase, score) structs in rank order. RAKE is a pure
  * per-document function — candidate phrases are maximal stopword-free
  * word runs, each word scores degree/frequency, a phrase scores the sum
  * of its words' scores — so the whole computation belongs in ONE
  * map-side loop per document. The previous DataFrame formulation
  * (retained as [[graft.Polish.textRakeKeywordsShuffle]] for the
  * equivalence spec) paid a per-doc window plus three doc-keyed shuffles
  * and two joins over the word-occurrence stream for what is
  * embarrassingly parallel work; at 100 TB this kernel makes the
  * operator scan-shaped — no shuffle before the final ordering.
  *
  * Bit-exactness with the unchanged DuckDB oracle is preserved by
  * replaying the engines' arithmetic exactly: the per-word
  * degree/frequency ratio goes through Spark's own double→DECIMAL(38,12)
  * cast ([[org.apache.spark.sql.types.Decimal]], shortest-string
  * semantics, HALF_UP), phrase sums are exact scale-12 BigDecimal
  * additions, the sum converts to double the way Spark casts
  * decimal→double, and ranking compares (score DESC, phrase ASC) with
  * phrase order the binary UTF-8 comparison both engines use. */
case class RakeTop3(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rake_top3"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("phrase", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RakeTop3.top3(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RakeTop3.top3($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RakeTop3 {
  /** The operator's stopword list — the single source; the DuckDB
    * oracle SQL in graft.Polish renders its IN-list from this array. */
  val Stops: Array[String] =
    Array("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val StopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Stops.foreach(s.add)
    s
  }

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Spark's `trim` strips 0x20 spaces only — not general whitespace. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  /** Spark's double→DECIMAL(38,12) cast, verbatim — r19: the common case
    * rides [[GramDecimalSum.scaledLong]]'s fixed-point fast path
    * (bit-identical by its property pins; `BigDecimal.valueOf(u, 12)` is
    * the same value and scale the Decimal walk produces), falling back
    * to the original path when the scaled value outgrows a Long. */
  private def quantize12(x: Double): java.math.BigDecimal = {
    // NaN/Inf must reach the Decimal path (which throws, as the original
    // did) — scaledLong's string walk is undefined on non-finite reprs
    val u = if (java.lang.Double.isFinite(x)) GramDecimalSum.scaledLong(x, 12)
            else Long.MinValue
    if (u != Long.MinValue) java.math.BigDecimal.valueOf(u, 12)
    else {
      val dec = Decimal(x)
      dec.changePrecision(38, 12)
      dec.toJavaBigDecimal
    }
  }

  def top3(text: String): GenericArrayData = {
    val words = Ws.split(trimSpaces(text), -1)
    // maximal stopword-free runs, in document order
    val phrases = new scala.collection.mutable.ArrayBuffer[Array[String]]()
    val cur = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (StopSet.contains(w)) {
        if (cur.nonEmpty) { phrases += cur.toArray; cur.clear() }
      } else cur += w
      i += 1
    }
    if (cur.nonEmpty) phrases += cur.toArray
    if (phrases.isEmpty) return new GenericArrayData(Array.empty[Any])
    // word frequency and degree (summed length of containing instances)
    val freq = new java.util.HashMap[String, Long]()
    val deg = new java.util.HashMap[String, Long]()
    phrases.foreach { p =>
      val plen = p.length.toLong
      p.foreach { w =>
        freq.put(w, freq.getOrDefault(w, 0L) + 1L)
        deg.put(w, deg.getOrDefault(w, 0L) + plen)
      }
    }
    // per-word score quantized exactly as the DataFrame cast did
    val wscore = new java.util.HashMap[String, java.math.BigDecimal]()
    val it = freq.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      wscore.put(e.getKey,
        quantize12(deg.get(e.getKey).toDouble / e.getValue.toDouble))
    }
    // phrase candidates: exact decimal sum → double (Spark's
    // decimal→double), phrase text space-joined
    val cands = phrases.map { p =>
      var sum = java.math.BigDecimal.ZERO
      p.foreach(w => sum = sum.add(wscore.get(w)))
      (p.mkString(" "), sum.doubleValue())
    }
    // (score DESC, phrase ASC-binary) — UTF8String order, as both
    // engines compare strings
    val top = cands.sortWith { case ((pa, sa), (pb, sb)) =>
      if (sa != sb) sa > sb
      else UTF8String.fromString(pa).compareTo(UTF8String.fromString(pb)) < 0
    }.take(3)
    new GenericArrayData(top.map { case (p, sc) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(p), sc))
    }.toArray[Any])
  }
}
