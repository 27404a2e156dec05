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

  test("t-closeness matches a brute-force TVD recount") {
    val ev = Q.t(spark, sf, "events")
      .selectExpr("event_type", "cast(hour(ts) as long) as hr",
        "user_id % 100 as cohort").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr"),
        r.getAs[Long]("cohort")))
    val nn = ev.length.toDouble
    val glob = ev.groupBy(_._3).map { case (c, v) => c -> v.length }
    val out = Polish.privacyTCloseness(spark, sf).collect()
    val byClass = ev.groupBy(e => (e._1, e._2))
    assert(out.length == byClass.size)
    out.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("hr"))
      val rows = byClass(k)
      val n = rows.length.toDouble
      val cls = rows.groupBy(_._3).map { case (c, v) => c -> v.length }
      // full TVD over ALL cohorts, absent ones at p_class = 0.
      // keys is a SET — map via iterator so equal terms don't collapse
      val tvd = 0.5 * glob.keys.iterator.map { c =>
        math.abs(cls.getOrElse(c, 0) / n - glob(c) / nn)
      }.sum
      assert(r.getAs[Long]("n") == rows.length, s"$k n")
      assert(math.abs(r.getAs[Double]("tvd") - tvd) < 1e-6, s"$k tvd")
      assert(r.getAs[Boolean]("t_close") == (tvd <= 0.25), s"$k close")
    }
  }

  test("kruskal-wallis matches a brute-force midrank computation") {
    val rows = Q.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "cast(l_quantity as long) as q").collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("q")))
    val n = rows.length.toDouble
    val byVal = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sorted = byVal.toSeq.sortBy(_._1)
    val midrank = sorted.scanLeft((0L, 0.0)) { case ((cum, _), (_, m)) =>
      (cum + m, cum + (m + 1.0) / 2.0)
    }.tail.map(_._2).zip(sorted).map { case (mr, (q, _)) => q -> mr }.toMap
    val groups = rows.groupBy(_._1)
    val s = groups.values.map { g =>
      val rg = g.map(e => midrank(e._2)).sum
      BigDecimal(rg * rg / g.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    val t3 = byVal.values.map(m =>
      BigDecimal(m.toDouble * m * m - m.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val hc = h / (1.0 - t3 / (n * n * n - n))
    val r = Polish.statKruskalWallis(spark, sf).collect().head
    assert(r.getAs[Long]("n_total") == rows.length)
    assert(r.getAs[Long]("k_groups") == groups.size)
    assert(math.abs(r.getAs[Double]("h_stat") - h) < 1e-6)
    assert(math.abs(r.getAs[Double]("h_tie_corrected") - hc) < 1e-6)
  }

  test("local clustering coefficients match a brute-force adjacency count") {
    val docs = Q.t(spark, sf, "documents").select("text").collect()
      .map(_.getString(0))
    val edges = docs.flatMap { t0 =>
      val ws = t0.trim.split("\\s+")
      ws.zip(ws.tail).filter(p => p._1 != p._2)
        .map(p => (Seq(p._1, p._2).min, Seq(p._1, p._2).max))
    }.distinct
    val adj = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val out = Polish.graphClusteringCoeff(spark, sf).collect()
    assert(out.length == math.min(20, adj.count(_._2.size >= 2)))
    out.foreach { r =>
      val v = r.getAs[String]("node")
      val nb = adj(v)
      val deg = nb.size.toLong
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      val coeff = 2.0 * tri / (deg.toDouble * (deg - 1.0))
      assert(r.getAs[Long]("deg") == deg, s"$v deg")
      assert(r.getAs[Long]("n_tri") == tri, s"$v tri")
      assert(math.abs(r.getAs[Double]("coeff") - coeff) < 1e-6, s"$v coeff")
    }
    // the ranking really is by coefficient
    val cs = out.map(_.getAs[Double]("coeff"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("dickey-fuller matches a brute-force OLS of diff on lag") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("date_trunc('day', ts) as day").collect()
      .groupBy(_.getAs[java.sql.Timestamp]("day"))
      .map { case (d0, v) => (d0, v.length.toLong) }.toSeq.sortBy(_._1)
      .map(_._2)
    val pairs = daily.zip(daily.tail).map { case (x, y) => (x, y - x) }
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sz = pairs.map(_._2).sum.toDouble
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val sxz = pairs.map(p => p._1 * p._2).sum.toDouble
    val szz = pairs.map(p => p._2 * p._2).sum.toDouble
    val rho = (m * sxz - sx * sz) / (m * sxx - sx * sx)
    val alpha = (sz - rho * sx) / m
    val sse = szz - alpha * sz - rho * sxz
    val se = math.sqrt((sse / (m - 2.0)) / (sxx - sx * sx / m))
    val r = Polish.statDickeyFuller(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(math.abs(r.getAs[Double]("rho") - rho) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_stat") - rho / se) < 1e-6)
    assert(r.getAs[Boolean]("stationary") == (rho / se < -2.86))
  }

  test("embedding isotropy matches a brute-force centroid-cosine scan") {
    val embs = Q.t(spark, sf, "embeddings").select("vec_id", "embedding")
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = embs.head.length
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val cent = (0 until dim).map(i =>
      embs.map(v => d12(v(i))).sum.toDouble / embs.length)
    val cnorm = math.sqrt(cent.map(c => d12(c * c)).sum.toDouble)
    // dot and norm are plain sequential left folds (the literal-centroid
    // map-side shape); only the keyed/global reduces ride decimal lanes
    val coss = embs.map { v =>
      val dot = v.zip(cent).map { case (x, c) => x * c }.sum
      val nrm = math.sqrt(v.map(x => x * x).sum)
      dot / (nrm * cnorm)
    }
    val r = Polish.embIsotropy(spark, sf).collect().head
    assert(r.getAs[Long]("n_vecs") == embs.length)
    assert(math.abs(r.getAs[Double]("mean_cos") -
      coss.map(d12).sum.toDouble / embs.length) < 1e-6)
    assert(math.abs(r.getAs[Double]("min_cos") - coss.min) < 1e-6)
    assert(math.abs(r.getAs[Double]("max_cos") - coss.max) < 1e-6)
    assert(math.abs(r.getAs[Double]("frac_pos") -
      coss.count(_ > 0).toDouble / embs.length) < 1e-6)
  }

  test("mattr matches a brute-force sliding-window TTR") {
    val docs = Q.t(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.trim.split("\\s+")
          .filter(_.nonEmpty).toSeq)
    val out = Polish.textMattr(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.filter(_._2.nonEmpty).foreach { case (id, ws) =>
      val n = ws.length
      val wlen = math.min(50, n)
      val starts = 1 to math.max(n - 49, 1)
      val totalU = starts.map { s0 =>
        ws.slice(s0 - 1, s0 - 1 + wlen).distinct.length.toLong
      }.sum
      val mattr = totalU.toDouble / (starts.length.toLong * wlen)
      val r = out(id)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id n")
      assert(r.getAs[Long]("n_windows") == starts.length, s"doc $id wins")
      assert(math.abs(r.getAs[Double]("mattr") - mattr) < 1e-6, s"doc $id")
    }
  }

  test("MattrStats equals the posexplode + lag-window formulation") {
    val kernel = Polish.textMattr(spark, sf).collect().toSeq
    val windowed = Polish.textMattrWindowed(spark, sf).collect().toSeq
    assert(kernel.nonEmpty)
    assert(kernel == windowed,
      "MattrStats diverged from the (doc, tok) lag-window chain")
  }

  test("friedman matches a brute-force within-block midrank computation") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("cast(ts as date) as day", "event_type").collect()
      .groupBy(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("event_type")))
      .map { case ((d0, e), v) => (d0, e, v.length.toLong) }.toSeq
    val k = daily.map(_._2).distinct.length
    val blocks = daily.groupBy(_._1).filter(_._2.length == k)
    val n = blocks.size.toDouble
    // per-block midranks over the k counts
    val ranks = blocks.toSeq.flatMap { case (_, rows) =>
      val ys = rows.map(_._3).sorted
      rows.map { case (_, e, y) =>
        val rmin = ys.indexOf(y) + 1
        val teq = ys.count(_ == y)
        e -> (rmin + (teq - 1.0) / 2.0)
      }
    }
    val rj = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val s2 = rj.values.toSeq.map(r => BigDecimal(r * r)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val tt = blocks.toSeq.flatMap { case (_, rows) =>
      rows.map(_._3).groupBy(identity).values.map(_.length.toDouble)
        .filter(_ > 1).map(m => BigDecimal(m * m * m - m)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.sum.toDouble
    val q = 12.0 / (n * k * (k + 1.0)) * s2 - 3.0 * n * (k + 1.0)
    val corr = 1.0 - tt / (n * k * (k * k - 1.0))
    val r = Polish.statFriedman(spark, sf).collect().head
    assert(r.getAs[Long]("n_blocks") == blocks.size)
    assert(r.getAs[Long]("k_treatments") == k)
    assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-6)
    assert(math.abs(r.getAs[Double]("q_tie_corrected") - q / corr) < 1e-6)
  }

  test("cohens kappa matches a brute-force 2x2 recount") {
    val docs = Q.t(spark, sf, "documents").select("text").collect()
      .map(_.getString(0))
    val rated = docs.map { t0 =>
      val nTok = t0.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
      val chars = t0.replaceAll("\\s", "").length.toLong
      val sym = t0.replaceAll("[A-Za-z0-9\\s]", "").length.toLong
      val a = nTok >= 50 && nTok <= 100000 &&
        chars >= 3 * nTok && chars <= 10 * nTok
      val b = sym * 10 < t0.length
      (a, b)
    }
    val n11 = rated.count(p => p._1 && p._2).toLong
    val n10 = rated.count(p => p._1 && !p._2).toLong
    val n01 = rated.count(p => !p._1 && p._2).toLong
    val n00 = rated.count(p => !p._1 && !p._2).toLong
    val n = rated.length.toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) / n) * ((n11 + n01) / n) +
      ((n01 + n00) / n) * ((n10 + n00) / n)
    val r = Polish.statCohensKappa(spark, sf).collect().head
    assert(r.getAs[Long]("n11") == n11 && r.getAs[Long]("n10") == n10 &&
      r.getAs[Long]("n01") == n01 && r.getAs[Long]("n00") == n00)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-6)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-6)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1.0 - pe)) < 1e-6)
    // both raters must discriminate, or kappa is vacuous on this corpus
    assert(n11 + n10 > 0 && n01 + n00 > 0)
  }

  test("holt forecast matches a brute-force recursion per event type") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("event_type", "cast(ts as date) as day").collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString))
      .map { case ((e, d0), v) => (e, d0, v.length.toLong) }.toSeq
    val out = Polish.eventForecastHolt(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val byType = daily.groupBy(_._1)
    assert(out.size == byType.size)
    byType.foreach { case (e, rows) =>
      val ys = rows.sortBy(_._2).map(_._3.toDouble)
      var l = ys.head
      var b = if (ys.length < 2) 0.0 else ys(1) - ys.head
      ys.drop(1).foreach { x =>
        val l2 = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (l2 - l) + 0.8 * b
        l = l2
      }
      val r = out(e)
      assert(r.getAs[Long]("n_days") == ys.length, s"$e days")
      assert(math.abs(r.getAs[Double]("forecast") - (l + b)) < 1e-6, s"$e fc")
      assert(math.abs(r.getAs[Double]("trend") - b) < 1e-6, s"$e tr")
    }
  }

  test("cdc boundary scanner agrees between codegen, interpreted, and scala") {
    import org.apache.spark.sql.functions.col
    graft.functions.CdcBoundaries.register(spark)
    val docs = Q.t(spark, sf, "documents").select("doc_id", "text")
    def run(): Map[Long, Seq[Long]] = docs
      .select(col("doc_id"),
        graft.functions.CdcBoundaries.cdc_boundaries(col("text")).as("bs"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(withCodegen == interpreted)
    // and both equal the direct scala kernel on the raw strings
    val texts = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    texts.foreach { case (id, t0) =>
      assert(withCodegen(id) ==
        graft.functions.CdcBoundaries.scan(t0).toSeq, s"doc $id")
    }
  }

  test("native minhash signature equals the HOF formulation, any codegen mode") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 😀 (a UTF-16 surrogate pair) exercises the codepoint shingle walk
    // against Spark's own codepoint-counting substring() in the HOF
    val docs = Q.t(spark, sf, "documents").select("doc_id", "text")
      .union(Seq((900001L, "codepoint 😀 walk 😀 test 😀😀 doc"))
        .toDF("doc_id", "text"))
    def run(c: org.apache.spark.sql.Column): Map[Long, Seq[Long]] = docs
      .select(col("doc_id"), c.as("m")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val native = run(Pipeline.minhashSignature)
    val hof = run(Pipeline.minhashSignatureHof)
    assert(native == hof)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run(Pipeline.minhashSignature) finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(native == interpreted)
    assert(native.valuesIterator.forall(_.length == 16))
  }

  test("native simhash signature equals the HOF formulation, any codegen mode") {
    import org.apache.spark.sql.functions.col
    val docs = Q.t(spark, sf, "documents").select("doc_id", "text")
    def run(c: org.apache.spark.sql.Column): Map[Long, Long] = docs
      .select(col("doc_id"), c.as("m")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("m")).toMap
    val native = run(Pipeline.simhashSignature)
    assert(native == run(Pipeline.simhashSignatureHof))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run(Pipeline.simhashSignature) finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(native == interpreted)
    // 32-bit signatures: the top 32 bits are always clear
    assert(native.valuesIterator.forall(v => v >= 0 && (v >> 32) == 0))
  }

  test("native banded min-hashes equal the HOF formulation, any codegen mode") {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = Q.t(spark, sf, "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("g"))
    def native(): Map[Long, Seq[Any]] = docs
      .select(col("doc_id"), org.apache.spark.sql.graftcol.NativeColumn.column(
        graft.functions.BandedMinHashes(
          org.apache.spark.sql.graftcol.NativeColumn.expression(col("g")), 16))
        .as("m"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Any](1)).toMap
    val hof = docs.select(col("doc_id"), expr(
        """transform(sequence(0, 15),
          |  j -> array_min(transform(g, x -> xxhash64(concat(x, '#', j)))))"""
          .stripMargin).as("m"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Any](1)).toMap
    val n0 = native()
    assert(n0 == hof)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try native() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(n0 == interpreted)
  }

  test("degree assortativity matches a brute-force edge-degree correlation") {
    val docs = Q.t(spark, sf, "documents").select("text").collect()
      .map(_.getString(0))
    val edges = docs.flatMap { t0 =>
      val ws = t0.trim.split("\\s+")
      ws.zip(ws.tail).filter(p => p._1 != p._2)
        .map(p => (Seq(p._1, p._2).min, Seq(p._1, p._2).max))
    }.distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (v, o) => v -> o.length.toLong }
    val pairs = edges.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val r0 = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    val r = Polish.graphDegreeAssortativity(spark, sf).collect().head
    assert(r.getAs[Long]("n_edges") == edges.length)
    assert(math.abs(r.getAs[Double]("assortativity") - r0) < 1e-6)
  }

  test("cronbach alpha matches a brute-force item-variance recount") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("cast(ts as date) as day", "event_type").collect()
      .groupBy(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("event_type")))
      .map { case ((d0, e), v) => (d0, e, v.length.toLong) }.toSeq
    val k = daily.map(_._2).distinct.length
    val blocks = daily.groupBy(_._1).filter(_._2.length == k)
    val n = blocks.size.toDouble
    def svar(xs: Seq[Long]) = {
      val s1 = xs.sum.toDouble; val s2 = xs.map(x => x * x).sum.toDouble
      (s2 - s1 * s1 / xs.length) / (xs.length - 1.0)
    }
    val svi = blocks.values.flatten.toSeq.groupBy(_._2).values
      .map(rows => BigDecimal(svar(rows.map(_._3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val vt = svar(blocks.values.map(_.map(_._3).sum).toSeq)
    val alpha = k / (k - 1.0) * (1.0 - svi / vt)
    val r = Polish.statCronbachAlpha(spark, sf).collect().head
    assert(r.getAs[Long]("k_items") == k)
    assert(r.getAs[Long]("n_subjects") == n.toLong)
    assert(math.abs(r.getAs[Double]("sum_item_var") - svi) < 1e-6)
    assert(math.abs(r.getAs[Double]("total_var") - vt) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-6)
  }

  test("entropy rate matches a brute-force transition recount") {
    val evs = Q.t(spark, sf, "events")
      .selectExpr("user_id", "cast(ts as double) as tsd", "event_id",
        "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("tsd"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val trans = evs.groupBy(_._1).values.toSeq.flatMap { rows =>
      val o = rows.sortBy(r => (r._2, r._3)).map(_._4)
      o.zip(o.tail)
    }
    val nij = trans.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ni = trans.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nn = trans.length.toDouble
    val h = nij.toSeq.map { case ((a, _), c) =>
      BigDecimal(-(c / nn) * math.log(c.toDouble / ni(a)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val r = Polish.eventEntropyRate(spark, sf).collect().head
    assert(r.getAs[Long]("n_transitions") == trans.length)
    assert(r.getAs[Long]("n_states") == ni.size)
    assert(math.abs(r.getAs[Double]("entropy_nats") - h) < 1e-6)
    assert(math.abs(r.getAs[Double]("entropy_bits") - h / math.log(2.0))
      < 1e-6)
    assert(r.getAs[Double]("entropy_nats") > 0)
  }

  test("heaps fit matches a brute-force log-log OLS") {
    val pts = Q.t(spark, sf, "documents").select("text").collect()
      .map(_.getString(0).toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .map(ws => (math.log(ws.length.toDouble),
        math.log(ws.distinct.length.toDouble)))
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val m = pts.length.toDouble
    val sx = pts.map(p => d12(p._1)).sum.toDouble
    val sy = pts.map(p => d12(p._2)).sum.toDouble
    val sxx = pts.map(p => d12(p._1 * p._1)).sum.toDouble
    val sxy = pts.map(p => d12(p._1 * p._2)).sum.toDouble
    val syy = pts.map(p => d12(p._2 * p._2)).sum.toDouble
    val dx = m * sxx - sx * sx; val dy = m * syy - sy * sy
    val nm = m * sxy - sx * sy
    val beta = nm / dx
    val r = Polish.textHeapsFit(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") == pts.length)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-6)
    assert(math.abs(r.getAs[Double]("k_coef") -
      math.exp((sy - beta * sx) / m)) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - nm * nm / (dx * dy)) < 1e-6)
    // natural vocabulary growth: beta strictly inside (0, 1)
    assert(beta > 0.0 && beta < 1.0)
  }

  test("durbin-watson and breusch-pagan match a brute-force OLS-residual recount") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("date_trunc('day', ts) as day").collect()
      .groupBy(_.getAs[java.sql.Timestamp]("day"))
      .map { case (d0, v) => (d0, v.length.toLong) }.toSeq.sortBy(_._1)
    val n = daily.length.toDouble
    val ys = daily.map(_._2)
    val ts = (1 to daily.length).map(_.toLong)
    val st = ts.sum.toDouble; val sy = ys.sum.toDouble
    val stt = ts.map(t => t * t).sum.toDouble
    val sty = ts.zip(ys).map { case (t, y) => t * y }.sum.toDouble
    val beta = (n * sty - st * sy) / (n * stt - st * st)
    val alpha = (sy - beta * st) / n
    val e = ts.zip(ys).map { case (t, y) => y.toDouble - alpha - beta * t }
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val num = e.zip(e.tail).map { case (a, b) => d12((b - a) * (b - a)) }
      .sum.toDouble
    val den = e.map(x => d12(x * x)).sum.toDouble
    val dw = num / den
    val rdw = Polish.statDurbinWatson(spark, sf).collect().head
    assert(rdw.getAs[Long]("n_days") == daily.length)
    assert(math.abs(rdw.getAs[Double]("dw") - dw) < 1e-6)
    assert(math.abs(rdw.getAs[Double]("rho_approx") - (1.0 - dw / 2.0)) < 1e-6)
    assert(rdw.getAs[Boolean]("positive_autocorr") == (dw < 1.5))
    // breusch-pagan over the same residuals
    val u = e.map(x => x * x)
    val su = u.map(d12).sum.toDouble
    val stu = ts.zip(u).map { case (t, x) => d12(t.toDouble * x) }.sum.toDouble
    val suu = u.map(x => d12(x * x)).sum.toDouble
    val dx = n * stt - st * st; val dy = n * suu - su * su
    val nm = n * stu - st * su
    val lm = n * (nm * nm / (dx * dy))
    val rbp = Polish.statBreuschPagan(spark, sf).collect().head
    assert(rbp.getAs[Long]("n_days") == daily.length)
    assert(math.abs(rbp.getAs[Double]("lm_stat") - lm) < 1e-6)
    assert(rbp.getAs[Boolean]("heteroskedastic") == (lm > 3.841))
  }

  test("modularity matches a brute-force recount over the LPA communities") {
    // communities from the shipped operator; modularity recomputed locally
    val lab = Refine.graphLabelProp(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[String]("community")).toMap
    val docs = Q.t(spark, sf, "documents").select("text").collect()
      .map(_.getString(0))
    val wt = new scala.collection.mutable.HashMap[(String, String), Long]()
    docs.foreach { t0 =>
      val ws = t0.trim.split("\\s+")
      if (ws.length >= 2) ws.zip(ws.tail).foreach { case (a, b) =>
        wt((a, b)) = wt.getOrElse((a, b), 0L) + 1L
        wt((b, a)) = wt.getOrElse((b, a), 0L) + 1L
      }
    }
    val w2 = wt.values.sum.toDouble
    val byC = wt.toSeq.groupBy(e => lab(e._1._1))
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val q = byC.values.map { es =>
      val ktot = es.map(_._2).sum.toDouble
      val win = es.filter(e => lab(e._1._1) == lab(e._1._2)).map(_._2)
        .sum.toDouble
      d12(win / w2 - (ktot / w2) * (ktot / w2))
    }.sum.toDouble
    val r = Refine.graphModularity(spark, sf).collect().head
    assert(r.getAs[Long]("n_communities") == byC.size)
    assert(math.abs(r.getAs[Double]("modularity") - q) < 1e-6)
    // Q ∈ [−0.5, 1]; on this densely-connected word-soup corpus LPA
    // collapses to one community and Q is exactly 0 — the correct value
    // (one community ⇒ in/W = 1 and (tot/W)² = 1), not a failure
    assert(r.getAs[Double]("modularity") >= -0.5 &&
      r.getAs[Double]("modularity") <= 1.0)
    if (byC.size == 1) assert(math.abs(r.getAs[Double]("modularity")) < 1e-9)
  }

  test("wilcoxon signed-rank matches a brute-force paired-halves recount") {
    val evs = Q.t(spark, sf, "events")
      .selectExpr("user_id", "unix_seconds(ts) as es").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("es")))
    val m = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val diffs = evs.groupBy(_._1).values
      .map(rows => 2L * rows.count(_._2 > m) - rows.length)
      .filter(_ != 0L).toSeq
    val n = diffs.length.toDouble
    val byVal = diffs.map(math.abs).groupBy(identity)
      .map { case (v, o) => v -> o.length.toLong }
    val sorted = byVal.toSeq.sortBy(_._1)
    val midrank = sorted.scanLeft((0L, 0.0)) { case ((cum, _), (_, m2)) =>
      (cum + m2, cum + (m2 + 1.0) / 2.0)
    }.tail.map(_._2).zip(sorted).map { case (mr, (v, _)) => v -> mr }.toMap
    val wplus = diffs.filter(_ > 0).map(d0 => midrank(math.abs(d0))).sum
    val t3 = byVal.values.map(m2 =>
      m2.toDouble * m2 * m2 - m2.toDouble).sum
    val mu = n * (n + 1.0) / 4.0
    val sig = math.sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - t3 / 48.0)
    val z = (wplus - mu) / sig
    val r = Polish.statWilcoxonSignedRank(spark, sf).collect().head
    assert(r.getAs[Long]("n_nonzero") == diffs.length)
    assert(math.abs(r.getAs[Double]("w_plus") - wplus) < 0.05)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
    assert(r.getAs[Boolean]("significant") == (math.abs(z) > 1.959964))
  }

  test("poisson dispersion matches a brute-force daily recount") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("date_trunc('day', ts) as day").collect()
      .groupBy(_.getAs[java.sql.Timestamp]("day"))
      .map(_._2.length.toLong).toSeq
    val n = daily.length.toDouble
    val mean = daily.sum / n
    val s2 = (daily.map(y => y.toDouble * y).sum - daily.sum.toDouble *
      daily.sum / n) / (n - 1.0)
    val r = Polish.eventPoissonDispersion(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(math.abs(r.getAs[Double]("mean_daily") - mean) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_daily") - s2) < 1e-6)
    assert(math.abs(r.getAs[Double]("dispersion") - s2 / mean) < 1e-6)
    assert(r.getAs[Boolean]("overdispersed") == (s2 / mean > 1.5))
  }

  test("bartlett matches a brute-force group-variance recount") {
    val rows = Q.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "cast(l_quantity as long) as q").collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("q")))
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.length.toDouble
    val nn = rows.length.toDouble
    def svar(xs: Seq[Long]) = {
      val s1 = xs.sum.toDouble; val s2 = xs.map(x => x * x).sum.toDouble
      (s2 - s1 * s1 / xs.length) / (xs.length - 1.0)
    }
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val spNum = groups.map(g => d12((g.length - 1.0) * svar(g))).sum.toDouble
    val sln = groups.map(g =>
      d12((g.length - 1.0) * math.log(svar(g)))).sum.toDouble
    val sinv = groups.map(g => d12(1.0 / (g.length - 1.0))).sum.toDouble
    val sp2 = spNum / (nn - k)
    val num = (nn - k) * math.log(sp2) - sln
    val cc = 1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1.0))
    val r = Polish.statBartlett(spark, sf).collect().head
    assert(r.getAs[Long]("n_total") == rows.length)
    assert(r.getAs[Long]("k_groups") == groups.length)
    assert(math.abs(r.getAs[Double]("pooled_var") - sp2) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2_stat") - num / cc) < 1e-6)
    assert(r.getAs[Boolean]("unequal_var") == (num / cc > 5.991))
  }

  test("granger causality matches a brute-force two-lag OLS") {
    val daily = Q.t(spark, sf, "events")
      .selectExpr("event_type", "cast(ts as date) as day").collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString))
      .map { case ((e, d0), v) => (e, d0, v.length.toLong) }.toSeq
    val types = daily.map(_._1).distinct.sorted.take(2)
    val xs = daily.filter(_._1 == types(0)).map(r => r._2 -> r._3).toMap
    val ys = daily.filter(_._1 == types(1)).map(r => r._2 -> r._3).toMap
    val days = (xs.keySet & ys.keySet).toSeq.sorted
    val pts = days.zip(days.tail).map { case (p, c) =>
      (ys(p), xs(p), ys(c)) // (u = lag-y, v = lag-x, w = y)
    }
    val n = pts.length.toDouble
    val su = pts.map(_._1).sum.toDouble; val sv = pts.map(_._2).sum.toDouble
    val sw = pts.map(_._3).sum.toDouble
    val suu = pts.map(p => p._1 * p._1).sum.toDouble
    val svv = pts.map(p => p._2 * p._2).sum.toDouble
    val suv = pts.map(p => p._1 * p._2).sum.toDouble
    val suw = pts.map(p => p._1 * p._3).sum.toDouble
    val svw = pts.map(p => p._2 * p._3).sum.toDouble
    val sww = pts.map(p => p._3 * p._3).sum.toDouble
    val det = n * (suu * svv - suv * suv) - su * (su * svv - suv * sv) +
      sv * (su * suv - suu * sv)
    val a = (sw * (suu * svv - suv * suv) -
      su * (suw * svv - suv * svw) + sv * (suw * suv - suu * svw)) / det
    val b = (n * (suw * svv - suv * svw) - sw * (su * svv - suv * sv) +
      sv * (su * svw - suw * sv)) / det
    val c = (n * (suu * svw - suw * suv) - su * (su * svw - suw * sv) +
      sw * (su * suv - suu * sv)) / det
    val sseU = sww - a * sw - b * suw - c * svw
    val br = (n * suw - su * sw) / (n * suu - su * su)
    val sseR = sww - ((sw - br * su) / n) * sw - br * suw
    val f = (sseR - sseU) / (sseU / (n - 3.0))
    val r = Polish.statGrangerCausality(spark, sf).collect().head
    assert(r.getAs[Long]("n_obs") == pts.length)
    assert(math.abs(r.getAs[Double]("coef_lag_y") - b) < 1e-6)
    assert(math.abs(r.getAs[Double]("coef_lag_x") - c) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-6)
    assert(r.getAs[Boolean]("granger_causes") == (f > 3.841))
  }

  test("ivf recall audit: one row per query, recall@5 clears the 60% floor") {
    val out = Pipeline.embIvfRecall(spark, sf).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("q_id")).toSet == (0L until 10L).toSet)
    out.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= 5)
      assert(math.abs(r.getAs[Double]("recall_at_5") - h / 5.0) < 1e-9)
    }
    // the scaladoc claim the op exists to verify: nProbe=6 mean recall ≥ 0.6
    val mean = out.map(_.getAs[Long]("n_hits")).sum / 50.0
    assert(mean >= 0.6, s"mean recall@5 $mean below the 60% floor")
  }

  test("plan audit: new ops join keyed or broadcast, single-row cross joins only") {
    // ops whose only non-equi join is the one single-row scalar broadcast
    // (tot / ties / cnorm) — anything more is a corpus-sized cartesian
    Seq(Polish.privacyTCloseness(spark, sf),
      Polish.statKruskalWallis(spark, sf),
      Polish.embIsotropy(spark, sf),
      Polish.eventEntropyRate(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(bnlj <= 1, s"expected at most the scalar cross join:\n$plan")
    }
    // two bounded scalar crosses (the k census + the tie/total table)
    Seq(Polish.statFriedman(spark, sf),
      Polish.statCronbachAlpha(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(bnlj <= 2, s"expected at most two scalar cross joins:\n$plan")
    }
    // equi-joins only (or none) in the rest
    Seq(Polish.graphClusteringCoeff(spark, sf),
      Polish.graphDegreeAssortativity(spark, sf),
      Polish.textMattr(spark, sf), Polish.statDickeyFuller(spark, sf),
      Polish.statCohensKappa(spark, sf), Polish.textHeapsFit(spark, sf),
      Polish.eventForecastHolt(spark, sf))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"), plan)
      }
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

  test("native RAKE kernel equals the shuffle formulation, any codegen mode") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String, Double)] =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[String]("phrase"), r.getAs[Double]("score"))).toSeq
    val native = rows(Polish.textRakeKeywords(spark, sf))
    val shuffle = rows(Polish.textRakeKeywordsShuffle(spark, sf))
    assert(native.nonEmpty && native == shuffle)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try rows(Polish.textRakeKeywords(spark, sf)) finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(native == interpreted)
    // CODEGEN_ONLY + fallback off: a codegen COMPILE failure in the
    // kernel would otherwise fall back to interpreted silently
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val forced = try rows(Polish.textRakeKeywords(spark, sf)) finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
    assert(native == forced)
  }

  test("native ngram hashes equal the HOF formulation, any codegen mode") {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = Q.t(spark, sf, "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("ws"))
    def native(): Map[Long, Seq[Long]] = docs
      .select(col("doc_id"), org.apache.spark.sql.graftcol.NativeColumn.column(
        graft.functions.NgramHashes(
          org.apache.spark.sql.graftcol.NativeColumn.expression(col("ws")), 3))
        .as("hs"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    // the pre-kernel builder: distinct word 3-grams in first-occurrence
    // order (short docs yield the single null gram, which xxhash64 maps
    // to the seed), each hashed at seed 42
    val hof = docs.select(col("doc_id"), expr(
        """transform(array_distinct(transform(
          |    sequence(1, greatest(size(ws) - 2, 1)),
          |    i -> concat(element_at(ws, i), ' ',
          |                element_at(ws, i + 1), ' ',
          |                element_at(ws, i + 2)))),
          |  g -> xxhash64(g))""".stripMargin).as("hs"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val n0 = native()
    assert(n0 == hof)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try native() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(n0 == interpreted)
  }

  test("native banded min long hashes equal the HOF formulation, any codegen mode") {
    import org.apache.spark.sql.functions.{col, expr}
    val nSeeds = 16
    val docs = Q.t(spark, sf, "documents")
      .select(col("doc_id"), org.apache.spark.sql.graftcol.NativeColumn.column(
        graft.functions.NgramHashes(
          org.apache.spark.sql.graftcol.NativeColumn.expression(
            expr("split(trim(text), '\\\\s+')")), 3)).as("hs"))
    def native(): Map[Long, Seq[Any]] = docs
      .select(col("doc_id"), org.apache.spark.sql.graftcol.NativeColumn.column(
        graft.functions.BandedMinLongHashes(
          org.apache.spark.sql.graftcol.NativeColumn.expression(col("hs")),
          nSeeds)).as("m"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Any](1)).toMap
    // SQL xxhash64 exposes no seed argument, so the twin is a Scala
    // brute force: per seed j, the min over the longs of xxhash64 at
    // seed 42 + j (independent loop and min logic, same hash primitive)
    val brute = docs.select(col("doc_id"), col("hs")).collect().map { r =>
      val hs = r.getSeq[Long](1)
      r.getAs[Long]("doc_id") -> (0 until nSeeds).map { j =>
        if (hs.isEmpty) null
        else hs.map(x => org.apache.spark.sql.catalyst.expressions
          .XxHash64Function.hash(x,
            org.apache.spark.sql.types.LongType, 42L + j)).min
      }
    }.toMap
    val n0 = native()
    assert(n0 == brute)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try native() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(n0 == interpreted)
  }
}
