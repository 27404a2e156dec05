package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel as a native codegen'd Catalyst expression.
  *
  * `minhash_sig(text)` = the [[MinHashSignature.NumHashes]]-lane MinHash
  * signature over the document's distinct character-8-gram shingles:
  * ONE md5 per shingle split into two 60-bit halves reduced mod
  * [[MinHashSignature.LaneP]], lane j the universal hash `(a + j·b) mod P`
  * (Broder's seeded-permutation family). Bit-identical to the HOF
  * formulation it replaces (Pipeline.minhashSignatureHof, kept for the
  * equivalence spec) and to the DuckDB oracle's CTE chain — the halves
  * are read straight from the digest bytes exactly as
  * `conv(substring(hex, 1, 15), 16, 10)` / `substring(hex, 17, 15)`
  * parse them. The HOF path re-entered the interpreter per shingle for
  * the substring, the md5 wrapper, two hex-string conv parses, and 16
  * array_min passes; this kernel is one generated loop per document —
  * the [[VectorKernel]] argument applied to the dedup family's single
  * hottest stage. */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignature.signature(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSignature.signature($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Seeded min-gram-hash bands as a native codegen'd Catalyst expression.
  *
  * `banded_min_hashes(g, nSeeds)` = for each seed j ∈ [0, nSeeds), the
  * minimum over the gram array of `xxhash64(concat(x, '#', j))` — the
  * single-hash-per-band LSH keys of the n-gram Jaccard dedup family.
  * Bit-identical to the HOF formulation it replaces
  * (`transform(sequence(...), j -> array_min(transform(g, x ->
  * xxhash64(concat(x, '#', j)))))`): the hash is Spark's own XXH64 over
  * the concatenated UTF8 bytes at seed 42 (`XxHash64Function`), a null
  * gram contributes the seed itself (xxhash64-of-null semantics), and an
  * empty gram array yields all-null minima (array_min-of-empty). The HOF
  * form re-entered the interpreter nSeeds·|grams| times per document. */
case class BandedMinHashes(child: Expression, seeds: Int)
    extends UnaryExpression {
  override def prettyName: String = "banded_min_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BandedMinHashes.compute(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BandedMinHashes.compute($c, $seeds)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandedMinHashes {
  private val XxSeed = 42L
  private val suffixes =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[UTF8String]]()

  def compute(g: ArrayData, seeds: Int): GenericArrayData = {
    val n = g.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](seeds)(null))
    val suf = suffixes.computeIfAbsent(seeds,
      k => Array.tabulate(k)(j => UTF8String.fromString("#" + j)))
    val mins = new Array[Long](seeds)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = g.getUTF8String(i)
      var j = 0
      while (j < seeds) {
        val h =
          if (x == null) XxSeed
          else org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(UTF8String.concat(x, suf(j)), StringType, XxSeed)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Distinct hashed word n-grams as a native codegen'd Catalyst
  * expression.
  *
  * `word_ngram_hashes(ws, n)` = xxhash64 (seed 42, over the UTF8 bytes
  * of the space-joined gram, exactly like `xxhash64(concat(...))`) of
  * each DISTINCT word n-gram of the word array, first-occurrence order
  * (array_distinct semantics). Mirrors the HOF gram builder including
  * its short-document edge: a doc with fewer than n words yields the
  * single null gram (concat-with-null), which hashes to the xxhash64
  * seed, matching `xxhash64(null)`. The gram STRINGS never leave this
  * loop — the dedup pipeline's distinct/election/banding/verify stages
  * all ride 8-byte hashes, and the exact string-set DuckDB oracle (plus
  * the banded==brute spec) fails loudly on any 64-bit collision. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "word_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {
  private val XxSeed = 42L

  def compute(ws: ArrayData, n: Int): GenericArrayData = {
    val nw = ws.numElements()
    val seen = new java.util.LinkedHashSet[String]()
    val last = math.max(nw - (n - 1), 1)
    var i = 0
    while (i < last) {
      if (i + n <= nw) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws.getUTF8String(i + j).toString)
          j += 1
        }
        seen.add(sb.toString)
      } else {
        seen.add(null) // concat with a missing word is the null gram
      }
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val g = it.next()
      out(k) =
        if (g == null) XxSeed
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.fromString(g), StringType, XxSeed)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct md5-lane hashed word n-grams as a native codegen'd Catalyst
  * expression — the md5-lane twin of [[NgramHashes]] for operators whose
  * DuckDB oracle buckets grams through the cross-engine md5 idiom
  * (`conv(substring(md5(g), 1, 15), 16, 10)`).
  *
  * `word_ngram_md5_lanes(ws, n)` = the 60-bit md5 lane of each DISTINCT
  * space-joined word n-gram, first-occurrence order (array_distinct
  * semantics). Bit-identical to the HOF formulation it replaces
  * (`array_distinct(transform(sequence(1, size(ws)−n+1), i ->
  * md5Lane(concat_ws(' ', slice(ws, i, n)))))` under the caller's
  * `size(ws) >= n` filter — a shorter array yields the empty result).
  * The gram STRINGS never leave this loop: novelty's first-occurrence
  * table rides 8-byte lanes both engines compute identically. */
case class NgramMd5Lanes(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "word_ngram_md5_lanes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: compute() reads each element's UTF8String
    // unconditionally (call sites pass split() output)
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramMd5Lanes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramMd5Lanes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramMd5Lanes {
  def compute(ws: ArrayData, n: Int): GenericArrayData = {
    val nw = ws.numElements()
    if (nw < n) return new GenericArrayData(Array.emptyLongArray)
    val ng = nw - n + 1
    val digest = MinHashSignature.md5Digest()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < ng) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(MinHashSignature.hexPrefix15(
        digest.digest(sb.toString.getBytes(StandardCharsets.UTF_8))))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct md5-lane hashed word n-grams WITH their per-document
  * multiplicities — the counted twin of [[NgramMd5Lanes]] for operators
  * whose rollup weighs grams by occurrence (dedup_substring's span
  * counts): `word_ngram_md5_lane_counts(ws, n)` =
  * `array<struct<g bigint, c bigint>>`, one entry per DISTINCT gram lane
  * in first-occurrence order, `c` its span multiplicity. Emits exactly
  * the rows `explode(grams) → groupBy(g, doc).count()` produced
  * (bit-identical lanes, identical counts) while never shipping the
  * per-span stream into a shuffle — the (gram, doc) reduce happens
  * inside this loop, so the only wide stage left downstream is the
  * gram-keyed spread window. */
case class NgramMd5LaneCounts(child: Expression, n: Int)
    extends UnaryExpression {
  override def prettyName: String = "word_ngram_md5_lane_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: compute() reads each element's UTF8String
    // unconditionally (call sites pass split() output)
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramMd5LaneCounts.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramMd5LaneCounts.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramMd5LaneCounts {
  def compute(ws: ArrayData, n: Int): GenericArrayData = {
    val nw = ws.numElements()
    if (nw < n) return new GenericArrayData(Array.empty[Any])
    val ng = nw - n + 1
    val digest = MinHashSignature.md5Digest()
    val counts = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    var i = 0
    while (i < ng) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws.getUTF8String(i + j).toString)
        j += 1
      }
      val lane: java.lang.Long = MinHashSignature.hexPrefix15(
        digest.digest(sb.toString.getBytes(StandardCharsets.UTF_8)))
      val slot = counts.get(lane)
      if (slot == null) counts.put(lane, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document bigram 128-bit-key multiplicities as a native codegen'd
  * expression — the bigram-LM twin of [[NgramMd5LaneCounts]]:
  * `bigram_hash_counts(ws)` = `array<struct<h1, h1b, h12, h12b, k>>`,
  * one entry per DISTINCT (unigram-pair, bigram-pair) hash quad in
  * first-occurrence order, `k` its occurrence count. Hash lanes replay
  * the engine's `xxhash64` chaining exactly — `h1 = xxhash64(w₁)`,
  * `h1b = xxhash64('g2', w₁)` (the literal salt hashes into the seed),
  * `h12 = xxhash64(w₁, w₂)`, `h12b = xxhash64('g2', w₁, w₂)` — so the
  * emitted rows are bit-identical to the HOF span explode +
  * `groupBy(doc_id, h1, h1b, h12, h12b).count()` they replace, while
  * the per-span stream (4 interpreted xxhash64 lambdas per span, then
  * a (doc, quad)-keyed exchange) never leaves this loop. Per-position
  * plain and salted unigram hashes are computed once and reused as the
  * seed chain of the following span's bigram lanes. */
case class BigramHashCounts(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bigram_hash_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h1b", LongType, nullable = false),
      StructField("h12", LongType, nullable = false),
      StructField("h12b", LongType, nullable = false),
      StructField("k", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: compute() reads each element's UTF8String
    // unconditionally (call sites pass split() output)
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BigramHashCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramHashCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramHashCounts {
  private val XxSeed = 42L
  /** `xxhash64('g2', …)` chains the salt through the seed slot. */
  private val G2Seed = org.apache.spark.sql.catalyst.expressions
    .XxHash64Function.hash(UTF8String.fromString("g2"), StringType, XxSeed)

  private final class Quad(val h1: Long, val h1b: Long, val h12: Long,
      val h12b: Long) {
    var k: Long = 0L
    override def hashCode: Int =
      java.lang.Long.hashCode(h12 * 31 + h12b)
    override def equals(o: Any): Boolean = o match {
      case q: Quad =>
        q.h1 == h1 && q.h1b == h1b && q.h12 == h12 && q.h12b == h12b
      case _ => false
    }
  }

  def compute(ws: ArrayData): GenericArrayData = {
    val nw = ws.numElements()
    if (nw < 2) return new GenericArrayData(Array.empty[Any])
    val hash = org.apache.spark.sql.catalyst.expressions.XxHash64Function
    // per-position plain + salted unigram hashes, computed once
    val a1 = new Array[Long](nw)
    val a1b = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      val w = ws.getUTF8String(i)
      a1(i) = hash.hash(w, StringType, XxSeed)
      a1b(i) = hash.hash(w, StringType, G2Seed)
      i += 1
    }
    val counts = new java.util.LinkedHashMap[Quad, Quad]()
    i = 0
    while (i < nw - 1) {
      val w2 = ws.getUTF8String(i + 1)
      val q = new Quad(a1(i), a1b(i),
        hash.hash(w2, StringType, a1(i)),
        hash.hash(w2, StringType, a1b(i)))
      val slot = counts.get(q)
      if (slot == null) { q.k = 1L; counts.put(q, q) } else slot.k += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.values().iterator()
    var k = 0
    while (it.hasNext) {
      val q = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](q.h1, q.h1b, q.h12, q.h12b, q.k))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Seeded minima over an already-hashed gram array: for each seed
  * j ∈ [0, nSeeds), min over the longs of xxhash64-at-seed-(42+j) — the
  * long-input twin of [[BandedMinHashes]] for pipelines whose grams
  * already ride as hashes. The per-band hash family is internal to the
  * LSH candidate generator (recall-only; the oracle is exact
  * all-pairs), so its exact form is free — re-seeding xxhash64 per band
  * is the standard seeded family. Empty input yields all-null minima
  * (array_min-of-empty semantics). */
case class BandedMinLongHashes(child: Expression, seeds: Int)
    extends UnaryExpression {
  override def prettyName: String = "banded_min_long_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BandedMinLongHashes.compute(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BandedMinLongHashes.compute($c, $seeds)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandedMinLongHashes {
  def compute(g: ArrayData, seeds: Int): GenericArrayData = {
    val n = g.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](seeds)(null))
    val mins = new Array[Long](seeds)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = g.getLong(i)
      var j = 0
      while (j < seeds) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(x, LongType, 42L + j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Distinct hashed 8-char shingles as a native codegen'd Catalyst
  * expression — the character-shingle twin of [[NgramMd5Lanes]], feeding
  * the containment verifier's hashed intersection.
  *
  * `shingle_hashes(text)` = xxhash64 (seed 42, over the UTF8 bytes, the
  * engine hash `xxhash64(x)` computes) of each DISTINCT 8-char shingle,
  * first-occurrence order. Shingle positions are 1-based
  * `i ∈ [1, max(len−7, 1)]` with `substring(text, i, 8)` truncation
  * semantics (a doc shorter than the window yields itself as its only
  * shingle, the empty string included) — bit-identical to the HOF
  * formulation it replaces (`transform(array_distinct(transform(
  * sequence(1, greatest(length(text) - 7, 1)), i -> substring(text, i,
  * 8))), x -> xxhash64(x))`), which re-entered the interpreter per
  * position AND per distinct shingle. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val ShingleLen = 8

  def compute(text0: UTF8String): GenericArrayData = {
    // substring() counts CODEPOINTS — walk codepoint boundaries, the
    // same route MinHashSignature.signature takes
    val text = text0.toString
    val offs = MinHashSignature.codePointOffsets(text)
    val n = offs.length - 1
    val last = math.max(n - (ShingleLen - 1), 1)
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 1
    while (i <= last) {
      val sh = text.substring(offs(i - 1), offs(math.min(i - 1 + ShingleLen, n)))
      if (seen.add(sh))
        out.add(org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.fromString(sh), StringType, 42L))
      i += 1
    }
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Intersection cardinality of two long arrays as a native codegen'd
  * Catalyst expression — `size(array_intersect(a, b))` without
  * materializing the intersection array (the containment verifier only
  * needs the count). Bit-identical semantics: the number of DISTINCT
  * elements of `a` that occur in `b` (array_intersect dedups its
  * output; both inputs here are already-distinct shingle-hash arrays,
  * but the dedup is replayed for exactness). */
case class ArrayLongIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "array_long_intersect_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> (no null elements) " +
          s"arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayLongIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayLongIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayLongIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val nb = b.numElements()
    val set = new java.util.HashSet[java.lang.Long](Math.max(16, nb * 2))
    var i = 0
    while (i < nb) { set.add(b.getLong(i)); i += 1 }
    var c = 0L
    val na = a.numElements()
    i = 0
    while (i < na) {
      val v = a.getLong(i)
      // remove-on-hit replays array_intersect's output dedup
      if (set.remove(v)) c += 1
      i += 1
    }
    c
  }
}

/** Count of positions where two long arrays agree, as one generated
  * loop — the MinHash pair-verify kernel. Replays
  * `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))` exactly:
  * zip_with pads the shorter side with nulls, `x = y` with a null
  * operand is null, and filter drops non-true — so the count is the
  * number of indices below min(|a|, |b|) where both elements are
  * non-null and equal. The HOF ran three interpreted lambdas per pair
  * row (the band-collision verify evaluates this once per candidate
  * pair — millions of rows at corpus scale); this is one generated
  * loop. */
case class EqualLaneCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "equal_lane_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    EqualLaneCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EqualLaneCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EqualLaneCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = Math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}

/** SimHash signature kernel as a native codegen'd Catalyst expression.
  *
  * `simhash_sig(text)` = the 32-bit SimHash of the document's
  * whitespace-split words: each word's md5-lane hash (first 15 hex
  * digits as a 60-bit long, the repo-wide md5Lane) votes ±1 per bit,
  * and bit b of the signature is set when the vote is positive.
  * Bit-identical to the HOF formulation it replaces
  * (Pipeline.simhashSignatureHof, kept for the equivalence spec): the
  * word list reproduces `split(trim(text), '\s+')` exactly — Spark's
  * trim strips SPACES only, and split keeps Java's limit=-1 semantics
  * (an empty/all-space document yields the single empty word, which is
  * hashed like any other). The HOF form ran 32 interpreted fold lambdas
  * over the lane array per document; this is one generated loop. */
case class SimHashSignature(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash_sig"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashSignature.signature(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashSignature.signature($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Spark's `trim` strips 0x20 spaces only — not general whitespace. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  def signature(text: String): Long = {
    val digest = MinHashSignature.md5Digest()
    val votes = new Array[Int](32)
    val words = Ws.split(trimSpaces(text), -1)
    var w = 0
    while (w < words.length) {
      val dg = digest.digest(
        words(w).getBytes(StandardCharsets.UTF_8))
      val h = MinHashSignature.hexPrefix15(dg)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      w += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object MinHashSignature {
  /** Lanes per signature; bands of [[BandSize]] consume them. */
  val NumHashes = 16
  /** Lanes per LSH band (4 bands of 4 at 16 lanes). */
  val BandSize = 4
  /** Mersenne prime 2³¹−1: lane values stay < 2³¹ so `a + j·b` can never
    * overflow a long. */
  val LaneP = 2147483647L
  private val ShingleLen = 8

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private[functions] def md5Digest(): MessageDigest = md.get()

  /** UTF-16 offsets of each codepoint boundary: `offs(k)` is the char
    * index where codepoint `k` starts and `offs(cpCount)` is
    * `s.length`. Spark's `substring()`/`length()` count CODEPOINTS, so a
    * shingle window must advance by codepoint — indexing by java char
    * would split surrogate pairs on supplementary-plane text (emoji,
    * rare CJK) and diverge from both the HOF twins and the DuckDB
    * oracle. For pure-BMP text this is the identity mapping. */
  private[functions] def codePointOffsets(s: String): Array[Int] = {
    val n = s.length
    val offs = new Array[Int](s.codePointCount(0, n) + 1)
    var ci = 0
    var k = 0
    while (ci < n) {
      offs(k) = ci
      ci = s.offsetByCodePoints(ci, 1)
      k += 1
    }
    offs(k) = n
    offs
  }

  /** Hex nibbles 0–14 of a digest as a 60-bit long — exactly what
    * `cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)` (the
    * repo-wide md5Lane) parses: bytes 0–6 plus the high nibble of
    * byte 7. Always nonnegative. */
  private[functions] def hexPrefix15(dg: Array[Byte]): Long = {
    var a = 0L
    var k = 0
    while (k < 7) { a = (a << 8) | (dg(k) & 0xffL); k += 1 }
    (a << 4) | ((dg(7) & 0xffL) >>> 4)
  }

  /** The scan kernel. Shingle positions are 1-based `i ∈ [1, max(len−7, 1)]`
    * with `substring(text, i, 8)` truncation semantics (a doc shorter than
    * the window yields itself as its only shingle, the empty string
    * included); distinctness via a per-call HashSet reproduces
    * array_distinct. The two digest halves are folded from the raw bytes:
    * hex nibbles 0–14 (bytes 0–6 plus the high nibble of byte 7) and hex
    * nibbles 16–30 (bytes 8–14 plus the high nibble of byte 15) — exactly
    * the 15-hex-digit substrings the SQL formulation parses, ≤ 60 bits so
    * always nonnegative. */
  def signature(text: String): Array[Long] = {
    val digest = md.get()
    // codepoint walk: substring(text, i, 8)/length(text) count codepoints
    val offs = codePointOffsets(text)
    val n = offs.length - 1
    val last = math.max(n - (ShingleLen - 1), 1)
    val seen = new java.util.HashSet[String]()
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 1
    while (i <= last) {
      val sh = text.substring(offs(i - 1), offs(math.min(i - 1 + ShingleLen, n)))
      if (seen.add(sh)) {
        val dg = digest.digest(sh.getBytes(StandardCharsets.UTF_8))
        val a = hexPrefix15(dg) % LaneP
        var b = 0L
        var k = 8
        while (k < 15) { b = (b << 8) | (dg(k) & 0xffL); k += 1 }
        b = ((b << 4) | ((dg(15) & 0xffL) >>> 4)) % LaneP
        var j = 0
        while (j < NumHashes) {
          val v = (a + j * b) % LaneP
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}

/** Per-document distinct words WITH their multiplicities as a native
  * codegen'd expression — the string-keyed sibling of
  * [[NgramMd5LaneCounts]] for operators whose downstream stages need the
  * term itself (tfidf_top_terms ships the term string to its df window):
  * `word_counts(ws)` = `array<struct<w string, c bigint>>`, one entry per
  * DISTINCT word in first-occurrence order, `c` its occurrence count.
  * Emits exactly the rows `explode(ws) → groupBy(doc, w).count()`
  * produced (same strings, same counts) while never shipping the raw
  * word stream into a shuffle — the (doc, word) term-frequency reduce
  * happens inside this loop (all words of a document already live in
  * one row), so the only wide stage left downstream is whatever keyed
  * stage consumes the reduced (word, count) pairs. Reference semantics:
  * the same reduce is the `unnest_columns` → `aggregate(count)` pair
  * (python/datafusion/dataframe.py:1741,799); this kernel is its
  * map-side fusion. */
case class WordCounts(child: Expression) extends UnaryExpression {
  override def prettyName: String = "word_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: compute() reads each element's UTF8String
    // unconditionally (call sites pass split() output)
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordCounts {
  def compute(ws: ArrayData): GenericArrayData = {
    val nw = ws.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nw) {
      // clone(): detach the key from the (possibly reused) input buffer
      // before it outlives this element read
      val w = ws.getUTF8String(i)
      val slot = counts.get(w)
      if (slot == null) counts.put(w.clone(), Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document distinct space-joined word BIGRAMS with multiplicities —
  * the order-2 sibling of [[WordCounts]]: `word_bigram_counts(ws)` =
  * `array<struct<w string, c bigint>>`, one entry per distinct
  * `ws[i-1] ⧺ ' ' ⧺ ws[i]` in first-occurrence order. Fuses the
  * `transform(sequence(1, size(ws)-1), i -> concat(ws[i-1], ' ', ws[i]))`
  * array materialization AND the downstream explode → groupBy reduce
  * into one loop, so a corpus-wide bigram frequency becomes
  * `explode(kernel) → groupBy(w).sum(c)` — the shuffle ships per-document
  * DISTINCT bigrams instead of every occurrence. Emits exactly the pairs
  * the explode → count formulation grouped (same concatenated strings,
  * same multiplicities; fewer than 2 words → empty array, like the
  * `size(ws) >= 2` guard it replaces). */
case class WordBigramCounts(child: Expression) extends UnaryExpression {
  override def prettyName: String = "word_bigram_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordBigramCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBigramCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordBigramCounts {
  def compute(ws: ArrayData): GenericArrayData = {
    val nw = ws.numElements()
    if (nw < 2) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    val space = UTF8String.fromString(" ")
    var i = 1
    while (i < nw) {
      // concat allocates a fresh UTF8String — safe as a map key
      val g = UTF8String.concat(ws.getUTF8String(i - 1), space,
        ws.getUTF8String(i))
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document DISTINCT space-joined word trigrams in one generated
  * loop — the native form of the `transform(sequence(1,
  * greatest(size(w) − 2, 1)), i -> concat(w[i], ' ', w[i+1], ' ',
  * w[i+2]))` + `array_distinct` HOF chain (graft.Pipeline.gramsExpr),
  * which interprets every per-gram lambda: `word_trigram_set(ws)` =
  * `array<string>` of first-occurrence-ordered distinct trigrams. Edge
  * replay: for documents with fewer than 3 words the HOF's
  * `sequence(1, 1)` emits ONE gram whose out-of-range `element_at`s are
  * null, so `concat` nulls the gram and `array_distinct` keeps `[null]`
  * — this kernel returns the same single-null array (hence
  * `containsNull = true`), and downstream explode/join/size behavior is
  * unchanged (a null gram never survives an inner join; size stays 1). */
case class WordTrigramSet(child: Expression) extends UnaryExpression {
  override def prettyName: String = "word_trigram_set"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordTrigramSet.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordTrigramSet.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordTrigramSet {
  def compute(ws: ArrayData): GenericArrayData = {
    val nw = ws.numElements()
    if (nw < 3) return new GenericArrayData(Array[Any](null))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + 2 < nw) {
      seen.add(UTF8String.concat(ws.getUTF8String(i), space,
        ws.getUTF8String(i + 1), space, ws.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Per-document distinct CHAINED-xxhash64 word trigrams in one generated
  * loop — the multi-argument-hash sibling of [[NgramHashes]] (which
  * hashes the space-JOINED gram string; the two values differ):
  * `trigram_xxhash_chain(ws)` = distinct values of
  * `xxhash64(ws[i−1], ws[i], ws[i+1])` for `i` in `1 ..
  * greatest(size − 2, 1)`, first-occurrence order. Replays Spark's
  * multi-arg XxHash64 exactly — seed 42, each NON-NULL argument folds
  * `XxHash64Function.hash(arg, StringType, prev)`, a null (out-of-range
  * `element_at`) argument is SKIPPED — so for short documents the gram
  * value is the hash of the surviving prefix words (all-null → the bare
  * seed), exactly the HOF's edge behavior. */
case class TrigramXxhashChain(child: Expression) extends UnaryExpression {
  override def prettyName: String = "trigram_xxhash_chain"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TrigramXxhashChain.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramXxhashChain.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramXxhashChain {
  private val XxSeed = 42L

  def compute(ws: ArrayData): GenericArrayData = {
    val nw = ws.numElements()
    val hi = math.max(nw - 2, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 1
    while (i <= hi) {
      var h = XxSeed
      var k = i - 1
      while (k <= i + 1) {
        if (k >= 0 && k < nw)
          h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(ws.getUTF8String(k), StringType, h)
        k += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Per-document distinct adjacent-word EDGES with multiplicities — the
  * struct-emitting sibling of [[WordBigramCounts]] for the co-occurrence
  * graph family: `bigram_edge_counts(ws)` =
  * `array<struct<src string, dst string, c bigint>>`, one entry per
  * distinct `(ws[i−1], ws[i])` pair in first-occurrence order. Fuses the
  * `transform(sequence(1, size(ws) − 1), i -> struct(ws[i−1], ws[i]))`
  * array build AND the downstream explode → (src, dst) reduce into one
  * loop, so every graph op's edge-weight shuffle ships per-document
  * DISTINCT edges instead of every occurrence.
  *
  * Exact HOF replay, including the single-word edge: for `size(ws) < 2`
  * the HOF's `sequence(1, size − 1)` DESCENDS (e.g. `[1, 0]` at one
  * word), emitting pairs whose out-of-range subscripts are null — this
  * kernel walks the same descending index list and emits the same
  * null-bearing structs (hence nullable fields), so unguarded call
  * sites (pagerank, BFS) see identical null-keyed groups and guarded
  * ones (`size(ws) >= 2`) are unaffected. */
case class BigramEdgeCounts(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bigram_edge_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("src", StringType, nullable = true),
      StructField("dst", StringType, nullable = true),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BigramEdgeCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramEdgeCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramEdgeCounts {
  /** Null-safe (src, dst) map key. */
  private final class EdgeKey(val src: UTF8String, val dst: UTF8String) {
    override def hashCode: Int =
      31 * (if (src == null) 0 else src.hashCode) +
        (if (dst == null) 0 else dst.hashCode)
    override def equals(o: Any): Boolean = o match {
      case k: EdgeKey => java.util.Objects.equals(src, k.src) &&
        java.util.Objects.equals(dst, k.dst)
      case _ => false
    }
  }

  def compute(ws: ArrayData): GenericArrayData = {
    val nw = ws.numElements()
    def at(idx: Int): UTF8String =
      if (idx < 0 || idx >= nw) null else ws.getUTF8String(idx)
    val counts = new java.util.LinkedHashMap[EdgeKey, Array[Long]]()
    // replay sequence(1, nw - 1): ascending for nw >= 2, DESCENDING
    // (step -1) when nw - 1 < 1 — the single-word null-edge case
    val hi = nw - 1
    val step = if (hi >= 1) 1 else -1
    var i = 1
    var more = true
    while (more) {
      val src = at(i - 1)
      val dst = at(i)
      val probe = new EdgeKey(src, dst)
      val slot = counts.get(probe)
      if (slot == null) {
        counts.put(new EdgeKey(
          if (src == null) null else src.clone(),
          if (dst == null) null else dst.clone()), Array(1L))
      } else slot(0) += 1L
      if (i == hi) more = false else i += step
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey.src, e.getKey.dst, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document MATTR (moving-average type-token ratio, window 50)
  * counting statistics in one generated loop:
  * `mattr_stats(toks)` = `struct<n bigint, nw bigint, tu bigint>` where
  * `n` is the token count, `nw = max(n − 49, 1)` the window count, and
  * `tu = Σ_p max(min(p, nw) − max(1, p − 49, q_p + 1) + 1, 0)` the total
  * type contributions (`q_p` = the previous position of token p's type,
  * 0 at first occurrence) — all exact integer arithmetic. Replays the
  * posexplode → (doc, tok)-partitioned lag window → doc rollup chain it
  * replaces term for term (same `p`/`q` definitions, same clamps), but
  * every token of a document lives in one row, so the op's token-level
  * shuffle — the largest exchange in the text battery — disappears
  * entirely; only the caller's final double division and rounding
  * remain outside. */
case class MattrStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "mattr_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("nw", LongType, nullable = false),
    StructField("tu", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MattrStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MattrStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MattrStats {
  private val W = 50L

  def compute(toks: ArrayData)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = toks.numElements().toLong
    val nw = math.max(n - (W - 1), 1L)
    val last = new java.util.HashMap[UTF8String, Array[Long]]()
    var tu = 0L
    var p = 1L
    while (p <= n) {
      val tok = toks.getUTF8String(p.toInt - 1)
      val slot = last.get(tok)
      val q = if (slot == null) 0L else slot(0)
      val c = math.max(
        math.min(p, nw) -
          math.max(math.max(1L, p - (W - 1)), q + 1L) + 1L, 0L)
      tu += c
      if (slot == null) last.put(tok.clone(), Array(p)) else slot(0) = p
      p += 1L
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, nw, tu))
  }
}

/** Per-document Shannon-entropy statistics in one generated loop:
  * `word_entropy_stats(ws)` =
  * `struct<n_words bigint, n_unique bigint, e_raw decimal(38,12)>`
  * where `e_raw = Σ_w cast(−p_w·ln p_w AS decimal(30,12))` over the
  * document's distinct words (p_w = count_w / n_words), summed exactly
  * as Spark's decimal `sum` aggregate performs it — per-term non-ANSI
  * Cast (`Decimal(double)` + `changePrecision(30,12)` HALF_UP, failure →
  * term skipped), java `BigDecimal.add` accumulation (exact, hence
  * order-free), final overflow check against the aggregate's
  * decimal(38,12) result type (null on overflow). Bit-identical to the
  * explode → groupBy(doc, w) → doc window → doc aggregate chain it
  * replaces ([[graft.Pipeline.textEntropyExploded]], the executable
  * documentation, is pinned row-equal in PipelineSpec): `p` is the same
  * long→double cast quotient, `ln` the same `Math.log`, and the decimal
  * quantization swallows any remaining representation question. All
  * words of a document live in one row, so the whole op becomes
  * map-side — at 100 TB the reduce that used to be two keyed exchanges
  * is zero exchanges. */
case class WordEntropyStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "word_entropy_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("e_raw", DecimalType(38, 12), nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> (no null elements) argument, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordEntropyStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordEntropyStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordEntropyStats {
  def compute(ws: ArrayData)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val nw = ws.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nw) {
      val w = ws.getUTF8String(i)
      val slot = counts.get(w)
      if (slot == null) counts.put(w.clone(), Array(1L)) else slot(0) += 1L
      i += 1
    }
    val total = nw.toDouble
    // r19: terms ride GramDecimalSum.scaledLong's fixed-point fast path
    // (exact HALF_UP(shortest-repr) at scale 12, ~10 ns vs ~300 ns for
    // the Decimal(double) string walk) and accumulate as scaled longs,
    // spilling to BigDecimal on 64-bit overflow — value-identical to the
    // per-term Decimal path it replaces (same spill design as
    // DecimalSqDevSum, property-pinned). A long-held unscaled value has
    // <= 19 digits, so the (30,12) precision gate the slow path owns is
    // unreachable on the fast path (18 integral digits allowed > the 7
    // a Long's scaled magnitude can carry).
    var accL = 0L
    var big: java.math.BigDecimal = null
    var any = false
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / total
      val t = -p * java.lang.Math.log(p)
      // non-ANSI Cast(double -> decimal(30,12)): NaN/Inf/overflow -> null
      // term, skipped by sum (unreachable for 0 < p <= 1, replayed anyway)
      if (!java.lang.Double.isNaN(t) && !java.lang.Double.isInfinite(t)) {
        val sc = GramDecimalSum.scaledLong(t, 12)
        if (sc != Long.MinValue) {
          any = true
          if (big != null) big = big.add(java.math.BigDecimal.valueOf(sc, 12))
          else {
            val s = accL + sc
            if (((accL ^ s) & (sc ^ s)) < 0)
              // 64-bit overflow: spill, re-doing this add exactly
              big = java.math.BigDecimal.valueOf(accL, 12)
                .add(java.math.BigDecimal.valueOf(sc, 12))
            else accL = s
          }
        } else {
          // scaled term outgrows a Long: original Decimal path (also
          // owns the precision-(30,12) skipped-term rule)
          val term = org.apache.spark.sql.types.Decimal(t)
          if (term.changePrecision(30, 12)) {
            any = true
            val tj = term.toJavaBigDecimal
            big = if (big != null) big.add(tj)
                  else java.math.BigDecimal.valueOf(accL, 12).add(tj)
          }
        }
      }
    }
    val eRaw: Any =
      if (!any) null
      else if (big != null) {
        // decimal sum result semantics: overflow past (38,12) -> null
        val dec = org.apache.spark.sql.types.Decimal(big)
        if (dec.changePrecision(38, 12)) dec else null
      } else // <= 19 digits: always fits (38,12)
        org.apache.spark.sql.types.Decimal(accL, 38, 12)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw.toLong, counts.size.toLong, eRaw))
  }
}
