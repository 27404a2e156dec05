package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the association / effect-size statistics:
  * each operator's distributed grid-or-moment topology is re-derived in
  * plain driver-side Scala from the collected sf0.001 corpus and must
  * agree to the statistic's rounding precision. */
class InsightSpec extends AnyFunSuite {
  import SparkSpec._

  private lazy val docs =
    Q.t(spark, sf, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text").collect()

  test("mutual information matches brute force; NMI in [0,1]") {
    val row = Insight.statMutualInfo(spark, sf).collect().head
    val n = docs.length.toDouble
    val cxy = docs.groupBy(r => (r.getAs[String]("lang"),
      r.getAs[String]("source"))).map { case (_, v) => v.length }
    val cx = docs.groupBy(_.getAs[String]("lang")).map(_._2.length)
    val cy = docs.groupBy(_.getAs[String]("source")).map(_._2.length)
    val mi = docs.groupBy(r => (r.getAs[String]("lang"),
      r.getAs[String]("source"))).map { case ((l, s), v) =>
      val pxy = v.length / n
      val px = docs.count(_.getAs[String]("lang") == l) / n
      val py = docs.count(_.getAs[String]("source") == s) / n
      pxy * math.log(pxy / (px * py))
    }.sum
    assert(math.abs(row.getAs[Double]("mi") - mi) < 1e-4,
      s"MI ${row.getAs[Double]("mi")} vs brute $mi")
    val nmi = row.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9, s"NMI out of range: $nmi")
    assert(cxy.sum == n.toInt && cx.sum == n.toInt && cy.sum == n.toInt)
  }

  test("Kendall tau-b matches O(n^2) brute force on the quantized scales") {
    val xy = docs.map(r => (r.getAs[Long]("n_chars") / 64,
      r.getAs[String]("text").trim.split("\\s+").length.toLong / 8))
    var c = 0L; var d = 0L
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val sx = java.lang.Long.compare(xy(j)._1, xy(i)._1)
      val sy = java.lang.Long.compare(xy(j)._2, xy(i)._2)
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
    }
    val n = xy.length.toLong
    val n0 = n * (n - 1) / 2
    val n1 = xy.groupBy(_._1).values.map(g =>
      g.length.toLong * (g.length - 1) / 2).sum
    val n2 = xy.groupBy(_._2).values.map(g =>
      g.length.toLong * (g.length - 1) / 2).sum
    val tau = (c - d).toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2))
    val row = Insight.statKendallTau(spark, sf).collect().head
    assert(row.getAs[Long]("concordant") == c,
      s"concordant ${row.getAs[Long]("concordant")} vs brute $c")
    assert(row.getAs[Long]("discordant") == d,
      s"discordant ${row.getAs[Long]("discordant")} vs brute $d")
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-5)
  }

  test("Cramers V matches brute-force chi2 and sits in [0,1]") {
    val ev = Q.t(spark, sf, "events")
      .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val n = ev.length.toDouble
    val types = ev.map(_._1).distinct.sorted
    val dows = ev.map(_._2).distinct.sorted
    var chi2 = 0.0
    for (t <- types; w <- dows) {
      val o = ev.count(e => e._1 == t && e._2 == w).toDouble
      val e = ev.count(_._1 == t) * ev.count(_._2 == w).toDouble / n
      chi2 += (o - e) * (o - e) / e
    }
    val row = Insight.statCramersV(spark, sf).collect().head
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-3,
      s"chi2 ${row.getAs[Double]("chi2")} vs brute $chi2")
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(row.getAs[Long]("dof") ==
      (types.length - 1).toLong * (dows.length - 1))
  }

  test("Cohen's d matches the textbook two-group formula for one pair") {
    val rows = Insight.statCohensD(spark, sf).collect()
    val r0 = rows.head
    val a = docs.filter(_.getAs[String]("source") ==
      r0.getAs[String]("source_a")).map(_.getAs[Long]("n_chars").toDouble)
    val b = docs.filter(_.getAs[String]("source") ==
      r0.getAs[String]("source_b")).map(_.getAs[Long]("n_chars").toDouble)
    def vr(x: Array[Double]) = {
      val m = x.sum / x.length
      x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
    }
    val pooled = math.sqrt(((a.length - 1) * vr(a) + (b.length - 1) * vr(b)) /
      (a.length + b.length - 2))
    val d = (a.sum / a.length - b.sum / b.length) / pooled
    assert(math.abs(r0.getAs[Double]("cohens_d") - d) < 1e-4,
      s"d ${r0.getAs[Double]("cohens_d")} vs brute $d")
    // pair coverage: C(sources, 2)
    val ns = docs.map(_.getAs[String]("source")).distinct.length
    assert(rows.length == ns * (ns - 1) / 2)
  }

  test("Brown-Forsythe F matches brute force and is nonnegative") {
    val groups = docs.groupBy(_.getAs[String]("source")).map { case (_, v) =>
      val xs = v.map(_.getAs[Long]("n_chars").toDouble).sorted
      val n = xs.length
      val med = (xs((n - 1) / 2) + xs(n / 2)) / 2.0
      v.map(r => math.abs(r.getAs[Long]("n_chars") - med))
    }.toSeq
    val k = groups.length
    val nTot = groups.map(_.length).sum
    val grand = groups.flatten.sum / nTot
    val ssb = groups.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(z => (z - m) * (z - m)).sum
    }).sum
    val f = ((nTot - k).toDouble / (k - 1)) * ssb / ssw
    val row = Insight.statLevene(spark, sf).collect().head
    assert(row.getAs[Long]("k") == k && row.getAs[Long]("n") == nTot)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-4,
      s"F ${row.getAs[Double]("f_stat")} vs brute $f")
    assert(row.getAs[Double]("f_stat") >= 0.0)
  }

  test("PII redaction counts every injected payload and removes chars") {
    val rows = Insight.textPiiRedact(spark, sf).collect()
    val docsN = rows.map(_.getAs[Long]("docs")).sum
    assert(docsN == docs.length)
    val e = rows.map(_.getAs[Long]("n_email")).sum
    val i = rows.map(_.getAs[Long]("n_ip")).sum
    val u = rows.map(_.getAs[Long]("n_url")).sum
    // injection schedule: one primary payload per doc + an extra email
    // every 7th doc (doc_ids are dense 0..n-1)
    val ids = docs.map(_.getAs[Long]("doc_id"))
    assert(e == ids.count(_ % 3 == 0) + ids.count(_ % 7 == 0))
    assert(i == ids.count(_ % 3 == 1))
    assert(u == ids.count(_ % 3 == 2))
    rows.foreach(r => assert(r.getAs[Long]("chars_redacted") > 0))
  }

  test("centroid drift: full pair coverage, cos<=1, and one pair re-derived") {
    val rows = Insight.embCentroidDrift(spark, sf).collect()
    val emb = Q.t(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val labels = emb.map(_._1).distinct.sorted
    assert(rows.length == labels.length * (labels.length - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("l2") >= 0.0)
      assert(math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9)
    }
    val r0 = rows.head
    def centroid(l: Int): Array[Double] = {
      val vs = emb.filter(_._1 == l).map(_._2)
      val dim = vs.head.length
      Array.tabulate(dim)(j => vs.map(_(j).toDouble).sum / vs.length)
    }
    val ca = centroid(r0.getAs[Long]("label_a").toInt)
    val cb = centroid(r0.getAs[Long]("label_b").toInt)
    val l2 = math.sqrt(ca.zip(cb).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(math.abs(r0.getAs[Double]("l2") - l2) < 1e-4,
      s"l2 ${r0.getAs[Double]("l2")} vs brute $l2")
  }

  test("table diff counts match the deterministic v2 derivation schedule") {
    val rows = Insight.tableDiff(spark, sf).collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("text_changes"))).toMap
    val ids = docs.map(_.getAs[Long]("doc_id"))
    val removed = ids.count(_ % 17 == 0).toLong
    val added = ids.count(_ % 13 == 0).toLong
    val changed = ids.count(i => i % 17 != 0 && i % 10 == 0).toLong
    assert(rows("removed")._1 == removed)
    assert(rows("added")._1 == added)
    assert(rows("changed")._1 == changed)
    assert(rows("unchanged")._1 == ids.length - removed - changed)
    // every changed doc changed in both audited columns under the schedule
    assert(rows("changed")._2 == changed)
  }

  test("BH adjustment: p_adj>=p, monotone in p-rank, rejects are a prefix") {
    val rows = Insight.statBhFdr(spark, sf).collect()
    val ns = docs.map(_.getAs[String]("source")).distinct.length
    assert(rows.length == ns * (ns - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("p") >= 0.0 && r.getAs[Double]("p") <= 1.0)
      assert(r.getAs[Double]("p_adj") >= r.getAs[Double]("p") - 1e-9)
    }
    val byP = rows.sortBy(r =>
      (r.getAs[Double]("p"), r.getAs[String]("source_a")))
    byP.sliding(2).foreach { w =>
      assert(w(1).getAs[Double]("p_adj") >= w(0).getAs[Double]("p_adj") - 1e-9,
        "p_adj must be monotone along the p-ranking")
    }
    val flags = byP.map(_.getAs[Boolean]("reject"))
    assert(!flags.dropWhile(identity).contains(true),
      "rejects must form a prefix of the p-ranking (step-up property)")
  }

  test("JL projection: full audit-pair coverage, bounded distortion") {
    val rows = Insight.embRandomProjection(spark, sf).collect()
    assert(rows.length == 30 * 29 / 2)
    val ds = rows.map(_.getAs[Double]("distortion"))
    ds.foreach(x => assert(x > 0.0 && !x.isNaN && !x.isInfinite))
    val mean = ds.sum / ds.length
    // 64->16 dims: expected distortion 1 with ~1/sqrt(16) spread
    assert(mean > 0.6 && mean < 1.6, s"mean distortion $mean out of range")
    rows.foreach(r => assert(r.getAs[Double]("d_orig") > 0.0))
  }
}
