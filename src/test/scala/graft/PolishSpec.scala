package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the round-11 operators. */
class PolishSpec extends AnyFunSuite {
  import SparkSpec._

  private val P = 1000000007L
  private val Mask = 64L
  private val Pow: IndexedSeq[Long] =
    (0 until 8).scanLeft(1L)((acc, _) => acc * 257L % P).take(8)

  /** Reference CDC chunker mirroring the operator's parameters. */
  private def cdcChunks(text: String): Seq[String] = {
    val cs = text.map(_.toLong)
    val bounds = (0 to cs.length - 8).flatMap { i0 =>
      val h = (0 until 8).map(j => cs(i0 + j) * Pow(7 - j)).sum % P
      if (h % Mask == 0) Some(i0 + 8) else None
    }
    val cuts = 0 +: bounds :+ text.length
    cuts.zip(cuts.tail).collect { case (a, b) if b > a =>
      text.substring(a, b)
    }
  }

  test("cdc chunking matches the reference chunker and reassembles") {
    val docs = Q.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val out = Polish.dedupCdcChunks(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // brute-force global accounting: first doc per chunk content
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, t0) =>
      cdcChunks(t0).foreach(c => firstDoc.getOrElseUpdate(c, id))
    }
    docs.foreach { case (id, t0) =>
      val cs = cdcChunks(t0)
      assert(cs.mkString == t0, s"doc $id chunks must reassemble")
      val r = out(id)
      assert(r.getAs[Long]("n_chunks") == cs.length, s"doc $id n_chunks")
      val dup = cs.filter(c => firstDoc(c) < id)
      assert(r.getAs[Long]("n_dup") == dup.length, s"doc $id n_dup")
      assert(r.getAs[Long]("dup_chars") == dup.map(_.length).sum.toLong,
        s"doc $id dup_chars")
    }
    assert(out.values.exists(_.getAs[Long]("n_dup") > 0),
      "corpus should contain duplicated chunk content")
  }

  test("cdc boundaries are content-defined: a prefix edit leaves later chunks intact") {
    // the defining CDC property fixed-size chunking lacks: insert one
    // char at the front and the chunk digests after the first boundary
    // are unchanged (all offsets shifted, content identical)
    val base = Q.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
      .find(cdcChunks(_).length >= 3).get
    val edited = "X" + base
    val a = cdcChunks(base)
    val b = cdcChunks(edited)
    // all chunks after the first boundary of each version coincide —
    // compared as MULTISETS (a Set compare would collapse a repeated
    // chunk content in the tail and undercount survivors)
    val bCounts = b.tail.groupBy(identity).map { case (c, v) => c -> v.length }
    val survived = a.tail.groupBy(identity).map { case (c, v) =>
      math.min(v.length, bCounts.getOrElse(c, 0))
    }.sum
    assert(survived >= a.length - 2,
      "later chunks must survive a prefix insertion")
  }

  test("l-diversity matches a brute-force recount") {
    val ev = Q.t(spark, sf, "events")
      .selectExpr("event_type", "cast(hour(ts) as long) as hr",
        "user_id % 100 as cohort").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr"),
        r.getAs[Long]("cohort")))
    val expected = ev.groupBy(e => (e._1, e._2)).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._3).distinct.length.toLong)
    }
    val out = Polish.privacyLDiversity(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("hr"))
      val (n, l) = expected(k)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("l") == l, s"$k")
      assert(r.getAs[Boolean]("diverse") == (l >= 5))
    }
  }

  test("changepoint is the argmax of the centered cumulative sum") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("date_trunc('day', ts) as day").collect()
      .groupBy(_.getAs[java.sql.Timestamp]("day"))
      .map { case (d0, v) => (d0, v.length.toLong) }.toSeq.sortBy(_._1)
    val tot = daily.map(_._2).sum
    val nd = daily.length
    val devs = daily.zipWithIndex.map { case ((d0, _), i) =>
      val cy = daily.take(i + 1).map(_._2).sum
      (d0, cy, i + 1L, cy.toDouble - (i + 1).toDouble * tot / nd)
    }
    val best = devs.maxBy(x => (math.abs(x._4), -x._1.getTime))
    val r = Polish.eventChangepoint(spark, sf).collect().head
    assert(r.getAs[java.sql.Timestamp]("cp_day") == best._1)
    assert(math.abs(r.getAs[Double]("cusum_dev") - best._4) < 1e-6)
    val pre = best._2.toDouble / best._3
    val post = (tot - best._2).toDouble / (nd - best._3)
    assert(math.abs(r.getAs[Double]("pre_mean") - pre) < 1e-6)
    assert(math.abs(r.getAs[Double]("post_mean") - post) < 1e-6)
  }

  test("jarque-bera matches a brute-force moment computation") {
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val ev = Q.t(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val out = Polish.statJarqueBera(spark, sf).collect()
    out.foreach { r =>
      val xs = ev.filter(_._1 == r.getAs[String]("event_type")).map(_._2)
      val n = xs.length.toDouble
      val s1 = xs.map(d12).sum.toDouble
      val s2 = xs.map(x => d12(x * x)).sum.toDouble
      val s3 = xs.map(x => d12(x * x * x)).sum.toDouble
      val s4 = xs.map(x => d12(x * x * x * x)).sum.toDouble
      val m = s1 / n
      val mu2 = s2 / n - m * m
      val mu3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
      val mu4 = s4 / n - 4.0 * m * (s3 / n) +
        6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m
      val sk = mu3 / math.pow(mu2, 1.5)
      val ku = mu4 / (mu2 * mu2)
      val jb = n / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0)
      assert(r.getAs[Long]("n") == xs.length)
      assert(math.abs(r.getAs[Double]("skewness") - sk) < 1e-6)
      assert(math.abs(r.getAs[Double]("kurtosis") - ku) < 1e-6)
      assert(math.abs(r.getAs[Double]("jb") - jb) < 1e-4)
    }
  }

  test("rake keywords match a brute-force extractor") {
    val stops = Set("the", "a", "of", "and", "to", "in", "is", "on",
      "for", "with")
    val docs = Q.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val out = Polish.textRakeKeywords(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.foreach { case (id, t0) =>
      // brute force: phrases = stopword-free runs
      val words = t0.trim.split("\\s+").toSeq
      val phrases = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      words.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) { phrases += cur.toSeq; cur.clear() } }
        else cur += w
      }
      if (cur.nonEmpty) phrases += cur.toSeq
      if (phrases.nonEmpty) {
        val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size)
        val deg = phrases.flatMap(p => p.map(_ -> p.length))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum)
        def d12(x: Double) =
          BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        val scored = phrases.map { p =>
          (p.mkString(" "),
            p.map(w => d12(deg(w).toDouble / freq(w))).sum.toDouble)
        }
        val top = scored.sortBy { case (ph, sc) => (-sc, ph) }.take(3)
        val got = out(id).sortBy(_.getAs[Long]("rank"))
          .map(r => (r.getAs[String]("phrase"), r.getAs[Double]("score")))
        assert(got.length == math.min(3, scored.length), s"doc $id count")
        got.zip(top).foreach { case ((gp, gs), (ep, es)) =>
          assert(gp == ep, s"doc $id phrase: $gp vs $ep")
          assert(math.abs(gs - es) < 1e-6, s"doc $id score")
        }
      } else assert(!out.contains(id))
    }
  }

  test("hurst exponent matches a brute-force rescaled-range estimate") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("date_trunc('day', ts) as day").collect()
      .groupBy(_.getAs[java.sql.Timestamp]("day"))
      .map { case (d0, v) => (d0, v.length.toLong) }.toSeq.sortBy(_._1)
      .map(_._2)
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def rsAvg(m: Int): Double = {
      val k = daily.length / m
      val segs = daily.take(k * m).grouped(m).toSeq
      segs.map { seg =>
        val sy = seg.sum
        val mean = sy.toDouble / m
        val devs = seg.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (cy, i) => cy.toDouble - (i + 1).toDouble * sy / m }
        val sd = math.sqrt(seg.map(y => y * y).sum.toDouble / m - mean * mean)
        d12((devs.max - devs.min) / sd)
      }.sum.toDouble / k
    }
    val r = Polish.statHurst(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(math.abs(r.getAs[Double]("rs8") - rsAvg(8)) < 1e-6)
    assert(math.abs(r.getAs[Double]("rs16") - rsAvg(16)) < 1e-6)
    val h = math.log(rsAvg(16) / rsAvg(8)) / math.log(2.0)
    assert(math.abs(r.getAs[Double]("hurst") - h) < 1e-6)
  }

  test("hurst: a constant segment contributes null R/S instead of a NaN cast error") {
    import spark.implicits._
    // 32 synthetic days; the first 8 share one count, so the m=8 segment 0
    // has sd = 0 exactly — its 0/0 must drop out of the scale average
    // (divisor nulled), never reach the ANSI NaN->DECIMAL cast
    val base = java.time.LocalDateTime.of(2025, 1, 1, 0, 0)
    def eventsFor(counts: Seq[Int]): Seq[java.sql.Timestamp] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(k =>
          java.sql.Timestamp.valueOf(base.plusDays(d).plusHours(k % 12)))
      }
    val counts = Seq.fill(8)(5) ++ (8 until 32).map(d => 3 + d % 7)
    val dir = java.nio.file.Files.createTempDirectory("graft_hurst").toString
    eventsFor(counts).toDF("ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val r = Polish.statHurst(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 32)
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def rsAvg(m: Int): Double = {
      val k = counts.length / m
      counts.take(k * m).grouped(m).toSeq.flatMap { seg =>
        val sy = seg.map(_.toLong).sum
        val mean = sy.toDouble / m
        val sd = math.sqrt(math.max(0.0,
          seg.map(y => y.toLong * y).sum.toDouble / m - mean * mean))
        if (sd == 0) None
        else {
          val devs = seg.scanLeft(0L)(_ + _).tail.zipWithIndex
            .map { case (cy, i) => cy.toDouble - (i + 1).toDouble * sy / m }
          Some(d12((devs.max - devs.min) / sd))
        }
      }.sum.toDouble / k
    }
    assert(math.abs(r.getAs[Double]("rs8") - rsAvg(8)) < 1e-6)
    assert(math.abs(r.getAs[Double]("rs16") - rsAvg(16)) < 1e-6)
    // an entirely constant series: every segment drops -> null scales and
    // null hurst, still no exception
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hurst2").toString
    eventsFor(Seq.fill(32)(4)).toDF("ts").write.mode("overwrite")
      .parquet(s"$dir2/events.parquet")
    val r2 = Polish.statHurst(spark, dir2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("rs8")) &&
      r2.isNullAt(r2.fieldIndex("hurst")))
  }

  test("orc roundtrip preserves every supplier row") {
    val src = Q.t(spark, sf, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // and the registered aggregate runs
    assert(Polish.scanOrcRoundtrip(spark, sf).collect().nonEmpty)
  }
}
