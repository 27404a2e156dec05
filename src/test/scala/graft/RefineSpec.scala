package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the round-10 refinement module, each
  * re-derived in plain driver-side Scala from the collected sf0.001
  * corpus. */
class RefineSpec extends AnyFunSuite {
  import SparkSpec._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val embs = Q.t(spark, sf, "embeddings")
    .select("vec_id", "embedding").collect()
    .map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    .sortBy(_._1)

  private lazy val docs = Q.t(spark, sf, "documents")
    .select("doc_id", "text", "source").collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
      r.getAs[String]("source")))

  test("semantic dedup matches brute-force cluster-bounded pruning") {
    val rows = Refine.dedupSemantic(spark, sf).collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
      dot / (na * nb)
    }
    val seeds = embs.take(16)
    // assignment: nearest seed centroid, ties to the lowest cluster id
    val asg = embs.map { case (id, v) =>
      val best = seeds.map { case (cid, c) =>
        (c.indices.map(i => BigDecimal((v(i) - c(i)) * (v(i) - c(i)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum, cid)
      }.min
      id -> (best._2, v)
    }.toMap
    // expected: per vector, the highest-cosine lower-id same-cluster
    // neighbor above τ (ties to the lowest id)
    val expected = embs.flatMap { case (j, vj) =>
      val (cj, _) = asg(j)
      val cands = embs.filter { case (i, _) => i < j && asg(i)._1 == cj }
        .map { case (i, vi) => (i, cos(vi, vj)) }
        .filter(_._2 >= 0.35)
      if (cands.isEmpty) None
      else {
        val (k, c) = cands.minBy { case (i, c) => (-c, i) }
        Some(j -> (cj, k, math.rint(c * 1e6) / 1e6))
      }
    }.toMap
    assert(rows.length == expected.size, "dropped-vector count")
    rows.foreach { r =>
      val j = r.getAs[Long]("vec_id")
      val (cid, k, c) = expected(j)
      assert(r.getAs[Long]("cid") == cid, s"cid of $j")
      assert(r.getAs[Long]("keeper") == k, s"keeper of $j")
      assert(math.abs(r.getAs[Double]("cos_sim") - c) < 1e-6, s"cos of $j")
    }
  }

  test("classifier score matches per-token hash-weight accumulation") {
    val rows = Refine.textClassifierScore(spark, sf).collect()
    val expected = docs.map { case (id, text, _) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val ws = toks.map { t =>
        val b = java.lang.Long.parseLong(md5Hex(t).take(15), 16) % 4096L
        (b * 2654435761L % 2001L - 1000L).toDouble / 1000.0
      }
      id -> (toks.length.toLong, ws.sum / math.sqrt(toks.length.toDouble))
    }.toMap
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val (n, s0) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == n)
      assert(math.abs(r.getAs[Double]("score") - s0) < 1e-5)
      val p = 1.0 / (1.0 + math.exp(-r.getAs[Double]("score")))
      assert(math.abs(r.getAs[Double]("prob") - p) < 1e-5)
      assert(r.getAs[Boolean]("keep") == (r.getAs[Double]("score") > 0))
    }
  }

  test("source overlap matches brute-force shared-gram counting") {
    val rows = Refine.corpusSourceOverlap(spark, sf).collect()
    val bySource = docs.groupBy(_._3).map { case (src, ds) =>
      src -> ds.flatMap { case (_, text, _) =>
        val w = text.trim.split("\\s+")
        (0 until math.max(w.length - 2, 1))
          .map(i => Seq(w(i), w(math.min(i + 1, w.length - 1)),
            w(math.min(i + 2, w.length - 1))).mkString(" "))
      }.toSet
    }
    // NOTE: brute grams clamp indices at short texts; the engine's
    // element_at past the end yields null-joined grams that can't
    // collide across sources (every driver text has ≥ 3 words anyway)
    val srcs = bySource.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      sh = (bySource(a) & bySource(b)).size if sh > 0
    } yield (a, b) -> (sh,
      sh.toDouble / (bySource(a).size + bySource(b).size - sh))).toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (sh, j) = expected(key)
      assert(r.getAs[Long]("shared") == sh, s"shared of $key")
      assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-6)
    }
  }

  test("top-2 PCA matches deflated power iteration; components orthogonal") {
    val rows = Refine.embPcaTop2(spark, sf).collect()
    val d = embs.head._2.length
    def dec(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def mult(v: Array[Double]): Array[Double] = {
      // per-row dot is a plain double left-fold, like the engine's
      val dots = embs.map { case (_, x) =>
        x.indices.foldLeft(0.0)((s0, i) => s0 + x(i) * v(i))
      }
      Array.tabulate(d)(i => embs.indices.map(r =>
        dec(embs(r)._2(i) * dots(r))).sum.toDouble)
    }
    def norm(w: Array[Double]): Double =
      math.sqrt(w.map(x => dec(x * x)).sum.toDouble)
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var w1 = v; var l1 = 0.0
    for (_ <- 1 to 3) { w1 = mult(v); l1 = norm(w1); v = w1.map(_ / l1) }
    val v1 = v
    var u = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var o = u; var l2 = 0.0
    for (_ <- 1 to 3) {
      val w = mult(u)
      val p = w.indices.map(i => dec(w(i) * v1(i))).sum.toDouble
      o = Array.tabulate(d)(i => w(i) - p * v1(i))
      l2 = norm(o); u = o.map(_ / l2)
    }
    assert(rows.length == 2 * d)
    rows.foreach { r =>
      val i = r.getAs[Long]("i").toInt - 1
      val (load, lam) =
        if (r.getAs[Int]("component") == 1) (w1(i) / l1, l1)
        else (o(i) / l2, l2)
      assert(math.abs(r.getAs[Double]("loading") - load) < 1e-5)
      assert(math.abs(r.getAs[Double]("lambda") - lam) < 1e-3)
    }
    // the two reported directions are near-orthogonal
    val c1 = rows.filter(_.getAs[Int]("component") == 1)
      .sortBy(_.getAs[Long]("i")).map(_.getAs[Double]("loading"))
    val c2 = rows.filter(_.getAs[Int]("component") == 2)
      .sortBy(_.getAs[Long]("i")).map(_.getAs[Double]("loading"))
    val ip = c1.indices.map(i => c1(i) * c2(i)).sum
    assert(math.abs(ip) < 1e-3, s"components not orthogonal: $ip")
    // spectral order: lambda1 >= lambda2
    assert(l1 >= l2)
  }

  test("Matryoshka recall matches brute-force half-vs-full top-5") {
    val rows = Refine.embMatryoshkaRecall(spark, sf).collect()
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      dot / (math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x)) *
        math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x)))
    }
    val h = embs.map { case (id, v) => (id, v.take(v.length / 2)) }
    def top5(qs: Array[(Long, Array[Double])],
             all: Array[(Long, Array[Double])]): Map[Long, Set[Long]] =
      qs.filter(_._1 < 10).map { case (q, qv) =>
        q -> all.filter(_._1 != q)
          .map { case (c, cv) => (c, cosD(qv, cv)) }
          .sortBy { case (c, s0) => (-s0, c) }.take(5).map(_._1).toSet
      }.toMap
    val full = top5(embs, embs); val half = top5(h, h)
    assert(rows.length == full.size)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val ov = (full(q) & half(q)).size
      assert(r.getAs[Long]("n_overlap") == ov, s"overlap of $q")
      assert(math.abs(r.getAs[Double]("recall") - ov / 5.0) < 1e-9)
    }
  }

  test("distinctive terms match brute-force weighted log-odds") {
    val rows = Refine.textDistinctiveTerms(spark, sf).collect()
    val toks = docs.flatMap { case (_, text, src) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map(w => (src, w))
    }
    val sw = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ns = toks.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val yw = toks.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nn = toks.length.toDouble
    val expected = ns.keys.flatMap { src =>
      val zs = sw.collect { case ((s0, w), ysw) if s0 == src =>
        val aw = 100.0 * yw(w) / nn
        val delta =
          math.log((ysw + aw) / (ns(src) - ysw + 100.0 - aw)) -
            math.log((yw(w) - ysw + aw) / (nn - ns(src) - yw(w) + ysw + 100.0 - aw))
        val variance = 1.0 / (ysw + aw) + 1.0 / (yw(w) - ysw + aw)
        (w, delta / math.sqrt(variance))
      }.toSeq.sortBy { case (w, z) => (-z, w) }.take(3)
      zs.zipWithIndex.map { case ((w, z), i) =>
        (src, i + 1L) -> (w, z)
      }
    }.toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Long]("rank"))
      val (w, z) = expected(key)
      assert(r.getAs[String]("term") == w, s"term at $key")
      assert(math.abs(r.getAs[Double]("z_score") - z) < 1e-5)
    }
  }

  test("label propagation matches brute-force synchronous LPA") {
    val rows = Refine.graphLabelProp(spark, sf).collect()
    val pairs = docs.flatMap { case (_, text, _) =>
      val ws = text.trim.split("\\s+")
      ws.indices.dropRight(1).map(i => (ws(i), ws(i + 1)))
    }
    val und = (pairs ++ pairs.map(_.swap))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nodes = und.keys.map(_._1).toSet
    var lab = nodes.map(w => w -> w).toMap
    for (_ <- 1 to 3) {
      val next = nodes.map { n =>
        // .toSeq first: collect on a Map would re-collapse duplicate
        // label keys before the sum
        val votes = und.toSeq.collect { case ((s0, d0), wt) if s0 == n =>
          (lab(d0), wt)
        }.groupBy(_._1).map { case (l, v) => l -> v.map(_._2).sum }
        if (votes.isEmpty) n -> lab(n)
        else n -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
      }.toMap
      lab = next
    }
    assert(rows.length == nodes.size)
    rows.foreach { r =>
      assert(r.getAs[String]("community") == lab(r.getAs[String]("word")),
        s"community of ${r.getAs[String]("word")}")
    }
  }

  test("Mahalanobis OOD matches brute-force label-conditional scoring") {
    val rows = Refine.embOodMahalanobis(spark, sf).collect()
    val labels = Q.t(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val byLabel = embs.groupBy { case (id, _) => labels(id) }
    val d = embs.head._2.length
    val stats = byLabel.map { case (l, vs) =>
      l -> (0 until d).map { i =>
        val xs = vs.map(_._2(i))
        val n = xs.length.toDouble
        val s1 = xs.map(x => BigDecimal(x)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        val s2 = xs.map(x => BigDecimal(x * x)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (s1 / n, (s2 - s1 * s1 / n) / (n - 1) + 1e-6)
      }
    }
    val m2 = embs.map { case (id, v) =>
      val st = stats(labels(id))
      id -> v.indices.map { i =>
        val (mu, vr) = st(i)
        BigDecimal((v(i) - mu) * (v(i) - mu) / vr)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    }.toMap
    val top = m2.toSeq.sortBy { case (id, s0) => (-s0, id) }.take(10)
    assert(rows.length == 10)
    rows.zip(top).foreach { case (r, (id, s0)) =>
      assert(r.getAs[Long]("vec_id") == id)
      assert(r.getAs[Int]("label") == labels(id))
      assert(math.abs(r.getAs[Double]("m2") - s0) < 1e-5)
    }
  }

  test("k-anonymity audit matches brute-force group counting") {
    val rows = Refine.privacyKAnonymity(spark, sf).collect()
    val docsFull = Q.t(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
    val counts = docsFull.groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val n = counts((r.getAs[String]("lang"), r.getAs[String]("source")))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Boolean]("at_risk") == (n < 10))
    }
  }

  test("SES forecast matches the sequential recursion") {
    val rows = Refine.eventForecastSes(spark, sf).collect()
    val events = Q.t(spark, sf, "events")
      .selectExpr("event_type", "to_date(ts) as day").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day")))
    val daily = events.groupBy(identity)
      .map { case ((ty, day), v) => (ty, day.toString, v.length.toLong) }
      .toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val ys = daily.filter(_._1 == ty).sortBy(_._2).map(_._3)
      // sequential SES recursion, F1 = y1 — the ground truth the
      // closed-form weighted sum must reproduce
      var f = ys.head.toDouble
      ys.tail.foreach(y => f = 0.3 * y + 0.7 * f)
      assert(r.getAs[Long]("last_actual") == ys.last)
      assert(math.abs(r.getAs[Double]("forecast") - f) < 1e-6,
        s"SES forecast of $ty")
    }
  }

  test("discrete-Laplace release matches the geometric inverse CDF") {
    val rows = Refine.privacyDpCounts(spark, sf).collect()
    val counts = docs.groupBy { case (_, _, src) => src }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getAs[String]("lang") + "|" + r.getAs[String]("source")
      val lane = java.lang.Long.parseLong(md5Hex(key).take(15), 16)
      val u = (lane % 1000000L + 1).toDouble / 1000001.0
      val k = (math.signum(u - 0.5) *
        math.floor(-math.log(1.0 - 2.0 * math.abs(u - 0.5)))).toLong
      assert(r.getAs[Long]("released") == r.getAs[Long]("n") + k,
        s"release of $key")
    }
    // the mechanism actually perturbs: at least one group moves
    assert(rows.exists(r => r.getAs[Long]("released") != r.getAs[Long]("n")))
    assert(counts.nonEmpty) // docs fixture is loaded
  }

  test("DAU/MAU matches brute-force distinct-user counting") {
    val rows = Refine.eventDauMau(spark, sf).collect()
    val ev = Q.t(spark, sf, "events")
      .selectExpr("cast(date_trunc('day', ts) as string) as day", "user_id")
      .collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("user_id")))
    val mau = ev.map(_._2).distinct.length.toLong
    val dau = ev.groupBy(_._1)
      .map { case (d0, v) => d0 -> v.map(_._2).distinct.length.toLong }
    assert(rows.length == dau.size)
    rows.foreach { r =>
      val d0 = r.getAs[java.sql.Timestamp]("day").toLocalDateTime
        .toLocalDate.toString + " 00:00:00"
      assert(r.getAs[Long]("dau") == dau(d0), s"dau of $d0")
      assert(r.getAs[Long]("mau") == mau)
      assert(math.abs(r.getAs[Double]("stickiness") -
        dau(d0).toDouble / mau) < 1e-6)
    }
  }

  test("burstiness matches brute-force Fano factors") {
    val rows = Refine.textBurstiness(spark, sf).collect()
    val tc = docs.flatMap { case (id, text, _) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map(w => (id, w))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byTerm = tc.groupBy(_._1._2)
    val stats = byTerm.collect { case (w, m) if m.size > 1 =>
      val cs = m.values.map(_.toDouble).toSeq
      val n = cs.length.toDouble
      val mean = cs.sum / n
      val varc = cs.map(c => (c - mean) * (c - mean)).sum / (n - 1)
      w -> (m.size.toLong, cs.sum.toLong, varc / mean)
    }
    val top = stats.toSeq.sortBy { case (w, (_, tot, _)) => (-tot, w) }.take(20)
    assert(rows.length == math.min(20, stats.size))
    rows.zip(top).foreach { case (r, (w, (nd, tot, vmr))) =>
      assert(r.getAs[String]("term") == w)
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("total") == tot)
      assert(math.abs(r.getAs[Double]("vmr") - vmr) < 1e-5, s"vmr of $w")
    }
  }

  test("Tukey HSD matches brute-force studentized-range comparisons") {
    val rows = Refine.statTukeyHsd(spark, sf).collect()
    val lens = Q.t(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val by = lens.groupBy(_._1).map { case (s0, v) => s0 -> v.map(_._2) }
    val n = lens.length.toDouble; val k = by.size.toDouble
    val sb = by.values.map { xs =>
      val s1 = xs.sum.toDouble; s1 * s1 / xs.length
    }.sum
    val gs2 = lens.map { case (_, x) => x.toDouble * x }.sum
    val msw = (gs2 - sb) / (n - k)
    val srcs = by.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      ma = by(a).sum.toDouble / by(a).length
      mb = by(b).sum.toDouble / by(b).length
      q = math.abs(ma - mb) / math.sqrt(
        (msw / 2) * (1.0 / by(a).length + 1.0 / by(b).length))
    } yield (a, b) -> (ma - mb, q)).toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (md, q) = expected(key)
      assert(math.abs(r.getAs[Double]("mean_diff") - md) < 1e-5)
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-5)
      assert(r.getAs[Boolean]("significant") == (q > 5.01))
    }
  }

  test("funnel timing matches brute-force first-view-to-purchase gaps") {
    val rows = Refine.eventFunnelTime(spark, sf).collect()
    val ev = Q.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "cast(ts as long) as sec")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("sec")))
    val fv = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, v) => u -> v.map(_._3).min }
    val gaps = ev.filter(_._2 == "purchase")
      .filter { case (u, _, s0) => fv.get(u).exists(s0 > _) }
      .groupBy(_._1)
      .map { case (u, v) => v.map(_._3).min - fv(u) }
      .toSeq.map(_.toDouble).sorted
    def pct(p: Double): Double = {
      val pos = p * (gaps.length - 1)
      val lo = pos.toInt
      if (lo == gaps.length - 1) gaps(lo)
      else gaps(lo) + (pos - lo) * (gaps(lo + 1) - gaps(lo))
    }
    val r = rows.head
    assert(r.getAs[Long]("n_viewers") == fv.size)
    assert(r.getAs[Long]("n_converted") == gaps.length)
    assert(math.abs(r.getAs[Double]("median_sec") - pct(0.5)) < 1e-6)
    assert(math.abs(r.getAs[Double]("p25_sec") - pct(0.25)) < 1e-6)
    assert(math.abs(r.getAs[Double]("p75_sec") - pct(0.75)) < 1e-6)
  }

  test("Ljung-Box Q matches brute-force autocorrelation accumulation") {
    val rows = Refine.statLjungBox(spark, sf).collect()
    val hours = Q.t(spark, sf, "events")
      .selectExpr("unix_seconds(date_trunc('HOUR', ts)) div 3600 as h")
      .collect().map(_.getAs[Long]("h"))
    val counts = hours.groupBy(identity)
      .map { case (h, v) => h -> v.length.toLong }
    val n = counts.size.toDouble
    val mean = counts.values.sum / n
    val denom = counts.values.map(x => x.toDouble * x).sum - n * mean * mean
    val srho = (1 to 10).map { k =>
      val pairs = counts.toSeq.flatMap { case (h, x) =>
        counts.get(h - k).map(bx => (x.toDouble, bx.toDouble))
      }
      val num = pairs.map { case (x, bx) => x * bx }.sum -
        mean * (pairs.map(_._1).sum + pairs.map(_._2).sum) +
        pairs.length * mean * mean
      val r = num / denom
      BigDecimal(r * r / (n - k))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val q = n * (n + 2) * srho
    val r = rows.head
    assert(r.getAs[Long]("n") == counts.size)
    assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-4, s"Q: $q")
    assert(r.getAs[Boolean]("reject_white_noise") == (q > 18.307))
  }

  test("salted join equals the plain join result") {
    val salted = Refine.joinSaltedSkew(spark, sf).collect()
    val lens = docs.map { case (id, text, _) => (id, text) }
    assert(lens.nonEmpty) // docs fixture loaded
    val plain = {
      val d0 = Q.t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
      val dim = d0.groupBy("lang").agg(
        (org.apache.spark.sql.functions.sum("n_chars").cast("double") /
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))).as("lang_avg"))
      d0.join(dim, "lang")
    }.collect().groupBy(_.getAs[String]("lang"))
    salted.foreach { r =>
      val rows = plain(r.getAs[String]("lang"))
      val above = rows.count(x =>
        x.getAs[Long]("n_chars") > x.getAs[Double]("lang_avg"))
      assert(r.getAs[Long]("n") == rows.length)
      assert(r.getAs[Long]("above_avg") == above)
    }
    // the salted plan actually salts: its physical plan joins on __salt
    val plan = Refine.joinSaltedSkew(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), "salt column absent from the plan")
  }

  test("bot detection matches brute-force interarrival CV") {
    val rows = Refine.eventBotsDetect(spark, sf).collect()
    val ev = Q.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "cast(ts as long) as sec")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("sec")))
    val expected = ev.groupBy(_._1).flatMap { case (u, v) =>
      val sorted = v.sortBy(x => (x._3, x._2)).map(_._3)
      val gaps = sorted.zip(sorted.tail).map { case (a, b) => b - a }
      if (gaps.length < 10) None
      else {
        val n = gaps.length.toDouble
        val mean = gaps.sum / n
        val s2 = gaps.map(g => BigDecimal(g.toDouble * g)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        val sd = math.sqrt((s2 - gaps.sum.toDouble * gaps.sum / n) / (n - 1))
        Some(u -> (gaps.length.toLong, mean, sd / mean))
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, mean, cv) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_gaps") == n)
      assert(math.abs(r.getAs[Double]("mean_gap_sec") - mean) < 1e-5)
      assert(math.abs(r.getAs[Double]("cv") - cv) < 1e-5)
      assert(r.getAs[Boolean]("bot_like") == (cv < 0.3))
    }
  }

  test("plan audit: no cartesian products; broadcasts where expected") {
    // semantic dedup: seed assignment is a map-side argmin kernel
    // (round 15 — no join at all), pair stage is an equi-join on cid —
    // never a cartesian. Round 18: the kernel folds ONCE into the
    // localCheckpoint-pinned rv, so the downstream plan must show the
    // pinned scan and must NOT re-inline the argmin (its presence here
    // would mean the pin failed and the kernel re-folds per consumer —
    // the protocol-split regression the pin exists to prevent)
    val sem = Refine.dedupSemantic(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!sem.contains("CartesianProduct"), "dedup_semantic cartesian")
    assert(!sem.contains("decimal_sqdev_argmin"),
      "argmin must stay pinned in the checkpointed rv, not re-inline downstream")
    assert(sem.contains("Scan ExistingRDD"),
      "the pinned rv should feed the downstream plan")
    // OOD scoring: the moment table joins broadcast, the reduce is keyed
    val ood = Refine.embOodMahalanobis(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!ood.contains("CartesianProduct"), "ood cartesian")
    assert(ood.contains("BroadcastHashJoin"), "ood broadcast")
    // source overlap: gram self-join must be a hash/merge equi-join
    val ov = Refine.corpusSourceOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!ov.contains("CartesianProduct") &&
      !ov.contains("BroadcastNestedLoopJoin"), "overlap non-equi join")
    // classifier score: single aggregation, no join at all
    val cls = Refine.textClassifierScore(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!cls.contains("Join"), "classifier should be join-free")
  }

  test("chunk manifest reassembles to the original payload") {
    val rows = Refine.mmChunkManifest(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val texts = docs.filter(_._1 < 50).map { case (id, t0, _) => id -> t0 }.toMap
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, chunks) =>
      val t0 = texts(id)
      val sortedC = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      // chunk count and coverage
      assert(sortedC.length == math.ceil(t0.length / 256.0).toInt)
      assert(sortedC.map(_.getAs[Long]("n_bytes")).sum ==
        t0.getBytes("UTF-8").length)
      assert(chunks.head.getAs[Long]("total_bytes") ==
        t0.getBytes("UTF-8").length)
      // digests match per-chunk md5
      sortedC.zipWithIndex.foreach { case (r, i) =>
        val c = t0.substring(i * 256, math.min((i + 1) * 256, t0.length))
        assert(r.getAs[String]("digest") == md5Hex(c), s"chunk $i of $id")
      }
    }
  }

  test("neighbor Jaccard matches brute-force adjacency overlap") {
    val rows = Refine.graphJaccardNeighbors(spark, sf).collect()
    val pairs = docs.flatMap { case (_, text, _) =>
      val ws = text.trim.split("\\s+")
      ws.indices.dropRight(1).map(i => (ws(i), ws(i + 1)))
    }
    val adj = (pairs ++ pairs.map(_.swap)).filter(p => p._1 != p._2)
      .distinct.groupBy(_._1).map { case (w, v) => w -> v.map(_._2).toSet }
    val words = adj.keys.toSeq.sorted
    val all = for {
      a <- words; b <- words if a < b
      sh = (adj(a) & adj(b)).size if sh > 0
    } yield (a, b, sh.toLong,
      sh.toDouble / (adj(a).size + adj(b).size - sh))
    val top = all.sortBy { case (a, b, _, j) => (-j, a, b) }.take(20)
    assert(rows.length == math.min(20, all.size))
    rows.zip(top).foreach { case (r, (a, b, sh, j)) =>
      assert(r.getAs[String]("wa") == a && r.getAs[String]("wb") == b)
      assert(r.getAs[Long]("shared") == sh)
      assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-6)
    }
  }

  test("ESD rounds remove and re-estimate like the sequential algorithm") {
    val rows = Refine.eventAnomalyEsd(spark, sf).collect()
    val days = Q.t(spark, sf, "events")
      .selectExpr("cast(date_trunc('day', ts) as string) as day")
      .collect().map(_.getAs[String]("day"))
    var tbl = days.groupBy(identity)
      .map { case (d0, v) => d0 -> v.length.toDouble }.toSeq
    val expect = (1 to 3).map { r =>
      val n = tbl.length.toDouble
      val mean = tbl.map(_._2).sum / n
      val sd = math.sqrt(
        tbl.map { case (_, y) => (y - mean) * (y - mean) }.sum / (n - 1))
      // deterministic argmax: max r_stat, ties to the EARLIEST day
      val best = tbl.map { case (d1, y1) => (math.abs(y1 - mean) / sd, d1, y1) }
        .sortBy { case (rs, d1, _) => (-rs, d1) }.head
      tbl = tbl.filterNot(_._1 == best._2)
      (r, best._2, best._3.toLong, best._1)
    }
    assert(rows.length == 3)
    rows.zip(expect).foreach { case (row, (r, d0, y, rs)) =>
      assert(row.getAs[Int]("round") == r)
      assert(row.getAs[java.sql.Timestamp]("day").toLocalDateTime
        .toLocalDate.toString + " 00:00:00" == d0, s"round $r day")
      assert(row.getAs[Long]("value") == y)
      assert(math.abs(row.getAs[Double]("r_stat") - rs) < 1e-5)
      assert(row.getAs[Boolean]("flagged") == (rs > 2.8))
    }
  }

  test("concentration shares match brute-force top-percent accounting") {
    val rows = Refine.eventConcentration(spark, sf).collect()
    val ev = Q.t(spark, sf, "events")
      .selectExpr("user_id", "cast(round(value * 100) as bigint) as c")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("c")))
    val users = ev.groupBy(_._1).map { case (u, v) => (u, v.map(_._2).sum) }
      .toSeq.sortBy { case (u, c) => (-c, u) }
    val total = users.map(_._2).sum.toDouble
    assert(rows.length == 4)
    rows.foreach { r =>
      val p = r.getAs[Long]("top_pct").toInt
      val k = math.ceil(users.length * p / 100.0).toInt
      assert(r.getAs[Long]("n_users") == k, s"tier $p size")
      val share = users.take(k).map(_._2).sum / total
      assert(math.abs(r.getAs[Double]("share") - share) < 1e-6, s"tier $p")
    }
    // shares are monotone in the tier and the 20% tier is substantial
    val shares = rows.sortBy(_.getAs[Long]("top_pct")).map(_.getAs[Double]("share"))
    assert(shares.sameElements(shares.sorted))
  }

  test("concentration is invariant to spark.sql.shuffle.partitions") {
    // its distPos ranking derives the range-partition width from the
    // session conf; results must be identical at a non-default width
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    val base = Refine.eventConcentration(spark, sf).collect().map(_.toString).toSeq
    try {
      conf.set("spark.sql.shuffle.partitions", "5")
      val narrow = Refine.eventConcentration(spark, sf).collect().map(_.toString).toSeq
      assert(narrow == base, "concentration drifted with the shuffle width")
    } finally conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("TwoNN intrinsic dimension matches the brute-force estimator") {
    val rows = Refine.embIntrinsicDim(spark, sf).collect()
    val anchors = embs.filter(_._1 < 100)
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.foldLeft(0.0)((s0, i) =>
        s0 + (a(i) - b(i)) * (a(i) - b(i))))
    val lrs = anchors.flatMap { case (q, qv) =>
      // DISTINCT positive distances, like the engine: duplicated content
      // would otherwise tie d1 = d2 and collapse the ratio to 1
      val ds = embs.filter(_._1 != q).map { case (c, cv) => l2(cv, qv) }
        .filter(_ > 0).distinct.sorted.take(2)
      if (ds.length < 2) None
      else Some(BigDecimal(math.log(ds(1) / ds(0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
    }
    val slr = lrs.sum.toDouble
    val r = rows.head
    assert(r.getAs[Long]("n_anchors") == lrs.length)
    assert(math.abs(r.getAs[Double]("mean_log_ratio") - slr / lrs.length) < 1e-5)
    assert(math.abs(r.getAs[Double]("intrinsic_dim") - lrs.length / slr) < 1e-3)
    // sanity: the estimate is positive and at most the nominal dimension
    assert(r.getAs[Double]("intrinsic_dim") > 0.0)
    assert(r.getAs[Double]("intrinsic_dim") <= embs.head._2.length * 2.0)
  }

  test("runs test matches the sequential run count and closed form") {
    val rows = Refine.statRunsTest(spark, sf).collect()
    val days = Q.t(spark, sf, "events")
      .selectExpr("cast(date_trunc('day', ts) as string) as day")
      .collect().map(_.getAs[String]("day"))
    val daily = days.groupBy(identity)
      .map { case (d0, v) => (d0, v.length.toDouble) }.toSeq.sortBy(_._1)
    val ys = daily.map(_._2).sorted
    val m = if (ys.length % 2 == 1) ys(ys.length / 2)
      else (ys(ys.length / 2 - 1) + ys(ys.length / 2)) / 2.0
    val signs = daily.filter(_._2 != m).map(_._2 > m)
    val r = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
    val n1 = signs.count(identity).toDouble
    val n2 = signs.length - n1
    val er = 2 * n1 * n2 / (n1 + n2) + 1
    val vr = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) /
      ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    val z = (r - er) / math.sqrt(vr)
    val row = rows.head
    assert(row.getAs[Long]("n1") == n1.toLong)
    assert(row.getAs[Long]("n2") == n2.toLong)
    assert(row.getAs[Long]("runs") == r)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-6)
    assert(row.getAs[Boolean]("looks_random") == (math.abs(z) <= 1.96))
  }

  test("Wilson interval matches the closed form and stays inside [0,1]") {
    val rows = Refine.statProportionCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val p = r.getAs[Long]("hits") / n
      val z = 1.96
      val denom = 1.0 + z * z / n
      val center = (p + z * z / (2 * n)) / denom
      val half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
      assert(math.abs(r.getAs[Double]("p_hat") - p) < 1e-6)
      assert(math.abs(r.getAs[Double]("ci_lo") - (center - half)) < 1e-6)
      assert(math.abs(r.getAs[Double]("ci_hi") - (center + half)) < 1e-6)
      assert(r.getAs[Double]("ci_lo") >= 0.0 && r.getAs[Double]("ci_hi") <= 1.0)
      assert(r.getAs[Double]("ci_lo") <= p && p <= r.getAs[Double]("ci_hi"))
    }
  }
}
