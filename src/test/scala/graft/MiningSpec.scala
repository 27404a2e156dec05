package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the model-prep mining operators, on the
  * collected sf0.001 corpus. */
class MiningSpec extends AnyFunSuite {
  import SparkSpec._

  private lazy val docs =
    Q.t(spark, sf, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
  private lazy val events =
    Q.t(spark, sf, "events").select("ts", "value").collect()
  private lazy val embs = Q.t(spark, sf, "embeddings")
    .select("vec_id", "label", "embedding").collect()
    .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
      r.getSeq[Float](2).map(_.toDouble).toArray))

  test("OLS2 solves the brute-force normal equations; R^2 in [0,1]") {
    val row = Mining.statOls2(spark, sf).collect().head
    val xy = events.map { r =>
      val ldt = r.getAs[java.sql.Timestamp]("ts").toLocalDateTime
      val x1 = ldt.getHour.toDouble
      val x2 = ldt.getDayOfWeek.getValue % 7 // Sunday=0, matches dayofweek-1
      val y = math.round(r.getAs[Double]("value") * 100).toDouble
      (x1, x2.toDouble, y)
    }
    // brute force via normal equations with a tiny Gaussian solve
    val n = xy.length.toDouble
    val (s1, s2, sy) = (xy.map(_._1).sum, xy.map(_._2).sum, xy.map(_._3).sum)
    val s11 = xy.map(t => t._1 * t._1).sum
    val s12 = xy.map(t => t._1 * t._2).sum
    val s22 = xy.map(t => t._2 * t._2).sum
    val s1y = xy.map(t => t._1 * t._3).sum
    val s2y = xy.map(t => t._2 * t._3).sum
    val a = Array(Array(n, s1, s2, sy), Array(s1, s11, s12, s1y),
      Array(s2, s12, s22, s2y))
    for (p <- 0 until 3; q <- 0 until 3 if q != p) {
      val f = a(q)(p) / a(p)(p)
      for (c <- 0 to 3) a(q)(c) -= f * a(p)(c)
    }
    val beta = (0 until 3).map(i => a(i)(3) / a(i)(i) / 100.0)
    assert(math.abs(row.getAs[Double]("beta0") - beta(0)) < 1e-4)
    assert(math.abs(row.getAs[Double]("beta1") - beta(1)) < 1e-4)
    assert(math.abs(row.getAs[Double]("beta2") - beta(2)) < 1e-4)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= -1e-9 && r2 <= 1.0, s"R^2 out of range: $r2")
  }

  test("k-fold audit: folds partition the corpus, chi2 matches by hand") {
    val out = Mining.splitKfold(spark, sf).collect()
    val n = docs.length.toLong
    assert(out.map(_.getAs[Long]("docs")).sum == n)
    assert(out.map(_.getAs[Long]("fold")).toSet.subsetOf((0L to 4L).toSet))
    out.foreach { r =>
      val d = r.getAs[Long]("docs").toDouble
      val e = n / 5.0
      assert(math.abs(r.getAs[Double]("chi2_uniform") -
        (d - e) * (d - e) / e) < 1e-6)
    }
  }

  test("peak detection finds exactly the brute-force peak set") {
    val out = Mining.eventPeakDetect(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("peak_hour"),
        r.getAs[Long]("events")))
    val hourly = events.groupBy { r =>
        val t = r.getAs[java.sql.Timestamp]("ts").toLocalDateTime
        t.withMinute(0).withSecond(0).withNano(0)
      }.map { case (h, v) => (h, v.length.toLong) }.toSeq.sortBy(_._1)
    val cs = hourly.map(_._2.toDouble)
    val mean = cs.sum / cs.length
    val sd = math.sqrt(cs.map(c => (c - mean) * (c - mean)).sum / (cs.length - 1))
    val brute = hourly.indices.drop(1).dropRight(1).filter { i =>
      hourly(i)._2 > hourly(i - 1)._2 && hourly(i)._2 > hourly(i + 1)._2 &&
        hourly(i)._2 > mean + 2 * sd
    }.map(i => hourly(i))
    assert(out.length == brute.length,
      s"peaks ${out.length} vs brute ${brute.length}")
    out.zip(brute).foreach { case ((ph, c), (bh, bc)) =>
      assert(ph.toLocalDateTime == bh && c == bc)
    }
  }

  test("triplet mining picks the brute-force hardest pos/neg per anchor") {
    val out = Mining.embTripletMining(spark, sf).collect()
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val anchors = embs.filter(_._1 < 20)
    assert(out.length == anchors.length)
    out.foreach { r =>
      val av = r.getAs[Long]("anchor")
      val (_, al, ax) = anchors.find(_._1 == av).get
      val cands = embs.filter(_._1 != av)
      val pos = cands.filter(_._2 == al)
        .map(c => (c._1, l2(ax, c._3))).maxBy(t => (t._2, -t._1))
      val neg = cands.filter(_._2 != al)
        .map(c => (c._1, l2(ax, c._3))).minBy(t => (t._2, t._1))
      assert(r.getAs[Long]("pos_id") == pos._1,
        s"anchor $av pos ${r.getAs[Long]("pos_id")} vs brute ${pos._1}")
      assert(r.getAs[Long]("neg_id") == neg._1)
      assert(math.abs(r.getAs[Double]("pos_dist") - pos._2) < 1e-5)
      assert(math.abs(r.getAs[Double]("neg_dist") - neg._2) < 1e-5)
      // margin rounds the unrounded difference: up to 1e-6 apart from the
      // difference of the independently-rounded distances
      assert(math.abs(r.getAs[Double]("margin") -
        (r.getAs[Double]("neg_dist") - r.getAs[Double]("pos_dist"))) < 2e-6)
    }
  }

  test("triplet mining kernel plan == the broadcast-join formulation") {
    val a = Mining.embTripletMining(spark, sf).collect().map(_.toString).toSeq
    val b = Mining.embTripletMiningJoin(spark, sf).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("McNemar cells tile the corpus and chi2 matches the 2x2") {
    val row = Mining.statMcnemar(spark, sf).collect().head
    val cells = docs.map { r =>
      val a = r.getAs[Long]("n_chars") >= 250
      val b = r.getAs[String]("text").trim.split("\\s+").length >= 40
      (a, b)
    }
    val bb = cells.count(c => c._1 && !c._2).toDouble
    val cc = cells.count(c => !c._1 && c._2).toDouble
    assert(row.getAs[Long]("n") == docs.length.toLong)
    assert(row.getAs[Long]("both_pass") == cells.count(c => c._1 && c._2))
    assert(row.getAs[Long]("only_len") == bb.toLong)
    assert(row.getAs[Long]("only_tok") == cc.toLong)
    assert(row.getAs[Long]("neither") == cells.count(c => !c._1 && !c._2))
    assert(math.abs(row.getAs[Double]("mcnemar_chi2") -
      (bb - cc) * (bb - cc) / (bb + cc)) < 1e-6)
  }
}
