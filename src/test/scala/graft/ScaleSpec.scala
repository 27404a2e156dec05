package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the round-10 scale-ops module: each
  * distributed construction is re-derived in plain driver-side Scala from
  * the collected sf0.001 corpus. */
class ScaleSpec extends AnyFunSuite {
  import SparkSpec._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def lane(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  private lazy val embs = Q.t(spark, sf, "embeddings")
    .select("vec_id", "embedding").collect()
    .map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))

  test("power iteration matches the brute-force Krylov recurrence") {
    val rows = Scale.embPowerIteration(spark, sf).collect()
    val d = embs.head._2.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var nw = 0.0
    var w = Array.fill(d)(0.0)
    for (_ <- 1 to 3) {
      // BigDecimal sums mirror the engines' DECIMAL(38,12) accumulators
      val dots = embs.map { case (_, x) =>
        x.indices.map(i => BigDecimal(x(i) * v(i))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      }
      w = Array.tabulate(d)(i => embs.indices.map(r =>
        BigDecimal(embs(r)._2(i) * dots(r))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      nw = math.sqrt(w.map(x => BigDecimal(x * x)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      v = w.map(_ / nw)
    }
    assert(rows.length == d)
    rows.foreach { r =>
      val i = r.getAs[Long]("i").toInt - 1
      assert(math.abs(r.getAs[Double]("loading") - v(i)) < 1e-5,
        s"dim $i loading ${r.getAs[Double]("loading")} vs brute ${v(i)}")
      assert(math.abs(r.getAs[Double]("lambda") - nw) < 1e-4)
    }
    // the result is a direction: unit norm
    assert(math.abs(rows.map(r => math.pow(r.getAs[Double]("loading"), 2))
      .sum - 1.0) < 1e-4)
  }

  test("key-skew audit agrees with collected counts") {
    val rows = Scale.auditKeySkew(spark, sf).collect()
    val counts = Q.t(spark, sf, "events").select("user_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => (k, v.length.toLong) }
    val totN = counts.values.sum
    val nKeys = counts.size.toLong
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(rows.length == 10)
    rows.zip(top).foreach { case (r, (k, c)) =>
      assert(r.getAs[Long]("user_id") == k)
      assert(r.getAs[Long]("cnt") == c)
      assert(r.getAs[Long]("share_ppm") == c * 1000000L / totN)
      val ratio = c.toDouble * nKeys / totN
      assert(math.abs(r.getAs[Double]("ratio_to_mean") - ratio) < 1e-5)
    }
  }

  test("shuffle-balance audit: bucket loads reconcile with the corpus") {
    val row = Scale.auditShuffleBalance(spark, sf).collect().head
    val loads = Q.t(spark, sf, "events").select("user_id").collect()
      .groupBy(r => lane(r.getLong(0).toString) % 32)
      .map(_._2.length.toLong)
    assert(row.getAs[Long]("n_buckets") == loads.size.toLong)
    assert(row.getAs[Long]("max_load") == loads.max)
    assert(row.getAs[Long]("min_load") == loads.min)
    assert(row.getAs[Double]("imbalance") >= 1.0)
  }

  test("reservoir sample is the k smallest md5 priorities, run-stable") {
    val a = Scale.sampleReservoir(spark, sf).collect()
    val ids = Q.t(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0))
    val expect = ids.map(id => (md5Hex(id.toString), id))
      .sortBy(identity).take(100).map(_._2).sorted
    assert(a.map(_.getAs[Long]("doc_id")).toSeq == expect.toSeq)
    a.foreach(r => assert(
      r.getAs[String]("priority") == md5Hex(r.getAs[Long]("doc_id").toString)))
    val b = Scale.sampleReservoir(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("winnowing fingerprints match the brute-force window minima") {
    val docs = Q.t(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def fingerprints(text: String): Set[Long] = {
      val ws = text.trim.split("\\s+")
      if (ws.length < 4) return Set.empty
      val hs = (0 to ws.length - 4)
        .map(p => lane(ws.slice(p, p + 4).mkString(" ")))
      // position p (1-based gram index) selected iff h(p) is the min of
      // the window of 4 gram hashes ending at p, for p >= 4
      (4 to hs.length).collect {
        case p if hs(p - 1) == (p - 4 until p).map(hs).min => hs(p - 1)
      }.toSet
    }
    val fps = docs.map { case (id, tx) => id -> fingerprints(tx) }.toMap
    val expectPairs = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      shared = (fa & fb).size if shared >= 3
    } yield ((a, b), shared.toLong)).toMap
    val got = Scale.textWinnow(spark, sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Long]("shared"))).toMap
    // textWinnow is LIMIT 50; sf0.001's pair count is below the limit,
    // so the comparison is total
    assert(expectPairs.size <= 50, "spec assumes the limit is not hit")
    assert(got == expectPairs,
      s"winnow pairs: got ${got.size}, expected ${expectPairs.size}")
  }

  test("ANN recall audit is consistent and bounded") {
    val rows = Scale.embAnnRecall(spark, sf).collect()
    assert(rows.length == 10) // queries are vec_id < 10
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 5L)
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= 5L)
      assert(math.abs(r.getAs[Double]("recall_at_5") - hits / 5.0) < 1e-9)
    }
    // the banded-LSH design point: decent aggregate recall vs brute force
    val total = rows.map(_.getAs[Long]("hits")).sum.toDouble / (10 * 5)
    assert(total >= 0.5, s"aggregate recall@5 $total below design point")
  }
}
