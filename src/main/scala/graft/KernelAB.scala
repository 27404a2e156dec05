package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.Decimal

/** Kernel-arithmetic diagnostic (round 19, the [[StageProbe]] of leaf
  * expressions): interleaved same-JVM A/B of the r19 decimal-kernel fast
  * path against a verbatim copy of the pre-r19 per-term loop
  * ([[legacySqDev]] — `Decimal(sq)` + `changePrecision` + `BigDecimal.add`
  * per term), on embedding-shaped inputs (20k vecs × 20 centroids, d=64
  * doubles in [−1, 1]), plus a value-identity spot check. Interleaving
  * rounds inside ONE JVM removes the JIT-warmth confound that makes
  * solo-run cell comparisons lie (the r18 dedup_semantic lesson); run
  * `sweep` for the 30M-case fast-path-vs-string-walk divergence check
  * (random finite bit patterns, embedding magnitudes, boundary-jittered
  * values, scales 0–12). r19 recording: legacy ~11.0 s vs new ~0.55 s per
  * 25.6M-term round, 0 mismatches, sweep 0 divergences
  * (OPTIMIZATION_r19.md). */
object KernelAB {
  def legacySqDev(v: ArrayData, cents: Array[Double], scale: Int): Decimal = {
    val d = math.min(v.numElements(), cents.length)
    var acc: java.math.BigDecimal = null
    var i = 0
    while (i < d) {
      if (!v.isNullAt(i)) {
        val dx = v.getDouble(i) - cents(i)
        val sq = dx * dx
        if (!java.lang.Double.isNaN(sq) && !java.lang.Double.isInfinite(sq)) {
          val term = Decimal(sq)
          if (term.changePrecision(38, scale))
            acc = if (acc == null) term.toJavaBigDecimal
                  else acc.add(term.toJavaBigDecimal)
        }
      }
      i += 1
    }
    if (acc == null) null
    else {
      val dec = Decimal(acc)
      if (dec.changePrecision(38, scale)) dec else null
    }
  }

  /** Exhaustive-ish sweep: scaledLong (fixed fast path + fallback) vs
    * scaledLongViaString on random finite bit patterns and
    * boundary-jittered values, all scales 0..12. */
  def sweep(): Unit = {
    val rnd = new java.util.Random(7)
    var mism = 0L
    var n = 0L
    var fastHits = 0L
    // 1) random finite doubles from raw bit patterns
    var i = 0
    while (i < 10000000) {
      val x = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!x.isNaN && !x.isInfinite) {
        val s = rnd.nextInt(13)
        val a = graft.functions.GramDecimalSum.scaledLong(x, s)
        val b = graft.functions.GramDecimalSum.scaledLongViaString(x, s)
        if (a != b) { mism += 1; if (mism < 10) println(s"MISMATCH x=$x s=$s fast=$a str=$b") }
        n += 1
      }
      i += 1
    }
    // 2) embedding-magnitude doubles (the hot kernels' actual range)
    i = 0
    while (i < 10000000) {
      val x = (rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(8) - 4)
      val s = rnd.nextInt(13)
      val a = graft.functions.GramDecimalSum.scaledLong(x, s)
      val b = graft.functions.GramDecimalSum.scaledLongViaString(x, s)
      if (a != b) { mism += 1; if (mism < 10) println(s"MISMATCH x=$x s=$s fast=$a str=$b") }
      n += 1
      i += 1
    }
    // 3) boundary-jittered: (2j+half)/2 * 10^-s, +-4 ulps
    i = 0
    while (i < 10000000) {
      val s = rnd.nextInt(13)
      val j = math.abs(rnd.nextLong()) % 4000000000000000L
      val half = rnd.nextInt(2)
      var x = (2.0 * j + half) / 2.0 / math.pow(10.0, s)
      var u = rnd.nextInt(9) - 4
      while (u > 0) { x = Math.nextUp(x); u -= 1 }
      while (u < 0) { x = Math.nextDown(x); u += 1 }
      if (rnd.nextBoolean()) x = -x
      val a = graft.functions.GramDecimalSum.scaledLong(x, s)
      val b = graft.functions.GramDecimalSum.scaledLongViaString(x, s)
      if (a != b) { mism += 1; if (mism < 10) println(s"MISMATCH x=$x s=$s fast=$a str=$b") }
      n += 1
      i += 1
    }
    println(s"sweep: $n cases, $mism mismatches")
  }

  /** The engine's non-ANSI Cast(double → decimal(p,s)) body, verbatim —
    * the legacy leg of the `cast` A/B. */
  def legacyCast(x: Double, p: Int, s: Int): Decimal =
    try {
      val d = Decimal(x)
      if (d.changePrecision(p, s)) d else null
    } catch { case _: NumberFormatException => null }

  /** Interleaved same-JVM A/B of Q.ddec's fast cast vs the engine Cast
    * on measure-shaped doubles (price×(1−disc) magnitudes, scale 6 —
    * the TPC-H dsum distribution) plus a value-identity check. */
  def castAB(): Unit = {
    val rnd = new scala.util.Random(42)
    val n = 4000000
    val xs = Array.fill(n)(
      (rnd.nextInt(9000000) + 90000) / 100.0 * (1.0 - rnd.nextInt(11) / 100.0))
    // warmup both paths
    xs.take(200000).foreach { x =>
      legacyCast(x, 30, 6); graft.functions.FastDoubleToDecimal.cast(x, 30, 6, true)
    }
    var sinkL = 0L; var sinkN = 0L
    (1 to 5).foreach { round =>
      // identityHashCode: data-dependent but allocation-free — a
      // BigDecimal-materializing sink (hashCode/toUnscaledLong) would
      // dominate the fast leg and hide the cast cost being measured
      val t0 = System.nanoTime()
      xs.foreach { x =>
        val r = legacyCast(x, 30, 6)
        if (r != null) sinkL += System.identityHashCode(r) & 1 }
      val t1 = System.nanoTime()
      xs.foreach { x =>
        val r = graft.functions.FastDoubleToDecimal.cast(x, 30, 6, true)
        if (r != null) sinkN += System.identityHashCode(r) & 1 }
      val t2 = System.nanoTime()
      println(f"round $round: engine-cast ${(t1 - t0) / 1e6}%8.1f ms   " +
        f"fast ${(t2 - t1) / 1e6}%8.1f ms  (${n} casts, decimal(30,6))")
    }
    var mism = 0
    xs.take(500000).foreach { x =>
      val a = legacyCast(x, 30, 6)
      val b = graft.functions.FastDoubleToDecimal.cast(x, 30, 6, true)
      val ok = (a == null && b == null) ||
        (a != null && b != null &&
          a.toJavaBigDecimal == b.toJavaBigDecimal)
      if (!ok) mism += 1 }
    println(s"cast mismatches=$mism sinks=$sinkL/$sinkN")
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("sweep")) { sweep(); return }
    if (args.contains("cast")) { castAB(); return }
    val rnd = new scala.util.Random(42)
    val n = 20000
    val d = 64
    val vecs: Array[ArrayData] = Array.fill(n)(new GenericArrayData(
      Array.fill[Any](d)(Double.box(rnd.nextDouble() * 2 - 1))))
    val cents = Array.fill(20)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
    // warmup both paths
    (0 until 2).foreach { _ =>
      vecs.take(2000).foreach { v =>
        cents.foreach { c =>
          legacySqDev(v, c, 12); graft.functions.DecimalSqDevSum.compute(v, c, 12)
        }
      }
    }
    var sinkL = 0L; var sinkN = 0L
    (1 to 5).foreach { round =>
      val t0 = System.nanoTime()
      vecs.foreach { v => cents.foreach { c =>
        val r = legacySqDev(v, c, 12); if (r != null) sinkL += r.toUnscaledLong & 1 } }
      val t1 = System.nanoTime()
      vecs.foreach { v => cents.foreach { c =>
        val r = graft.functions.DecimalSqDevSum.compute(v, c, 12)
        if (r != null) sinkN += r.toUnscaledLong & 1 } }
      val t2 = System.nanoTime()
      println(f"round $round: legacy ${(t1 - t0) / 1e6}%8.1f ms   new ${(t2 - t1) / 1e6}%8.1f ms  (${n}x${cents.length} sqdev d=$d)")
    }
    // value-identity spot check on the bench inputs
    var mism = 0
    vecs.take(2000).foreach { v => cents.foreach { c =>
      val a = legacySqDev(v, c, 12)
      val b = graft.functions.DecimalSqDevSum.compute(v, c, 12)
      val ok = (a == null && b == null) ||
        (a != null && b != null &&
          a.toJavaBigDecimal.compareTo(b.toJavaBigDecimal) == 0)
      if (!ok) mism += 1 } }
    println(s"mismatches=$mism sinks=$sinkL/$sinkN")
  }
}
