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
      // per-row dot is a plain double left-fold, like the engine's;
      // BigDecimal sums below mirror the DECIMAL(38,12) keyed reduce
      val dots = embs.map { case (_, x) =>
        x.indices.foldLeft(0.0)((s0, i) => s0 + x(i) * v(i))
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

  test("native winnow kernel equals the shuffle fingerprint selection, any codegen mode") {
    import org.apache.spark.sql.functions.{col, explode, expr}
    def kernel(): Set[(Long, Long)] = Q.t(spark, sf, "documents")
      .select(col("doc_id"), explode(
        org.apache.spark.sql.graftcol.NativeColumn.column(
          graft.functions.WinnowFingerprints(
            org.apache.spark.sql.graftcol.NativeColumn.expression(
              expr("split(trim(text), '\\\\s+')")), 4, 4))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shuffle = Scale.textWinnowFpsShuffle(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"))).toSet
    val n0 = kernel()
    assert(n0.nonEmpty && n0 == shuffle)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try kernel() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(n0 == interpreted)
  }

  test("forward as-of join matches the brute-force earliest-match scan") {
    val evs = Q.t(spark, sf, "events")
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val errs = evs.filter(_._4 == "error")
    val rows = Scale.joinAsofForward(spark, sf).collect()
    val clicks = evs.filter(_._4 == "click").sortBy(_._1)
    assert(rows.length == clicks.length)
    rows.zip(clicks).foreach { case (r, (id, u, tsm, _, _)) =>
      assert(r.getAs[Long]("event_id") == id)
      // earliest error at or after the click's ts; ties → min event_id
      val cand = errs.filter(e => e._2 == u && e._3 >= tsm)
      if (cand.isEmpty) assert(r.isNullAt(r.fieldIndex("match_event_id")))
      else {
        val best = cand.minBy(e => (e._3, e._1))
        assert(r.getAs[Long]("match_event_id") == best._1,
          s"click $id: got ${r.getAs[Long]("match_event_id")}, want ${best._1}")
      }
    }
  }

  test("sequence motifs match brute-force per-user trigram counts") {
    val evs = Q.t(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id"),
        r.getAs[String]("event_type")))
    val counts = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.size == 3).map(_.mkString(">"))
    }.groupBy(identity).map { case (m, v) => (m, v.size.toLong) }
    val top = counts.toSeq.sortBy { case (m, c) => (-c, m) }.take(20)
    val rows = Scale.eventSequenceNgrams(spark, sf).collect()
    assert(rows.length == math.min(20, counts.size))
    rows.zip(top).foreach { case (r, (m, c)) =>
      assert(r.getAs[String]("motif") == m && r.getAs[Long]("cnt") == c,
        s"rank ${r.getAs[Long]("rank")}: ${r.getAs[String]("motif")} vs $m")
    }
  }

  test("product quantization: per-subspace MSE matches brute-force Lloyd") {
    val rows = Scale.embPq(spark, sf).collect()
    val sub = 8; val w = embs.head._2.length / sub; val k = 4
    val seeds = embs.map(_._1).sorted.take(k)
    assert(rows.length == sub)
    for (g <- 0 until sub) {
      val slice = (v: Array[Double]) => v.slice(g * w, (g + 1) * w)
      var cents: Map[Long, Array[Double]] =
        seeds.map(id => id -> slice(embs.find(_._1 == id).get._2)).toMap
      def assign() = embs.map { case (id, v) =>
        val sv = slice(v)
        val (cid, dist) = cents.toSeq.map { case (c, cv) =>
          (c, sv.indices.map(i => math.pow(sv(i) - cv(i), 2)).sum)
        }.minBy { case (c, dd) => (dd, c) }
        (id, cid, dist)
      }
      val a1 = assign()
      cents = a1.groupBy(_._2).map { case (cid, as) =>
        val members = as.map(a => slice(embs.find(_._1 == a._1).get._2))
        cid -> Array.tabulate(w)(i => members.map(_(i)).sum / members.size)
      }
      val a2 = assign()
      val mse = a2.map(_._3).sum / a2.length
      val r = rows(g)
      assert(r.getAs[Long]("n") == embs.length.toLong)
      assert(r.getAs[Long]("codes_used") == a2.map(_._2).distinct.length.toLong)
      assert(math.abs(r.getAs[Double]("mse") - mse) < 1e-4,
        s"subspace $g mse ${r.getAs[Double]("mse")} vs brute $mse")
    }
  }

  test("PqArgmin kernel equals the struct-literal argmin expression") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // S=2 subspaces of width 3, K=3 centroids with non-consecutive cids;
    // rows cover ordinary values, a null element, a NaN element, exact
    // distance ties (tie must fall to the LOWER cid), and negative zeros.
    // (Ragged vectors and >1e8 squares are excluded: under the session's
    // ANSI mode the expression twin THROWS there, while the kernel keeps
    // the permissive null — the DecimalSqDevSum stance.)
    val cents: IndexedSeq[IndexedSeq[(Long, Array[Double])]] = IndexedSeq(
      IndexedSeq(7L -> Array(0.0, 1.0, -2.0), 3L -> Array(0.5, 1.0, -2.0),
        11L -> Array(-0.25, 0.125, 3.0)),
      IndexedSeq(7L -> Array(1.0, 1.0, 1.0), 3L -> Array(1.0, 1.0, 1.0),
        11L -> Array(0.0, 0.0, 0.0)))
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, -3.0, 0.5, 0.25, -0.125)),
      (2L, Seq[java.lang.Double](null, 0.5, 0.0, 1.0, 1.0, 1.0)),
      (3L, Seq[java.lang.Double](Double.NaN, 1.0, 1.0, 0.0, 0.0, 0.0)),
      (4L, Seq[java.lang.Double](null, null, null, null, null, null)),
      (5L, Seq[java.lang.Double](-0.0, 0.0, -0.0, 0.917, -2.34, 8.5)),
      (6L, Seq[java.lang.Double](0.25, 1.0, -2.0, 0.5, 0.5, 0.5)))
    val df = rows.toDF("vec_id", "v")
    def m(c: org.apache.spark.sql.Column): Seq[String] =
      df.select(col("vec_id"), c.as("ac")).orderBy("vec_id")
        .collect().map(_.toString).toSeq
    val hof = m(Scale.pqAssignHof(cents))
    val kern = m(Scale.pqAssignKernel(cents))
    assert(kern == hof)
    // row 6 subspace 0 is equidistant from cids 7 and 3 (0.25² each
    // side), and subspace 1 duplicates cid 7's and 3's centroids — both
    // ties must land on cid 3 in BOTH formulations
    assert(kern(5).contains("3]"))
    // interpreted == codegen'd
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try m(Scale.pqAssignKernel(cents)) finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(interp == kern)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val forced = try m(Scale.pqAssignKernel(cents)) finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
    assert(forced == kern)
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

  test("plan audit: literal-direction power iteration, single brute-force arm, bounded audits") {
    // power iteration constant-folds the direction vector into the plan:
    // no join of any kind may touch the corpus
    val pow = Scale.embPowerIteration(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!pow.contains("Join"), "power iteration grew a corpus join")
    // ANN recall: the brute-force scoring arm is the ONLY nested-loop
    // join (10 broadcast queries x corpus); the LSH arm must stay
    // hash-equi-joined and nothing may plan an unbounded cartesian
    val ann = Scale.embAnnRecall(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!ann.contains("CartesianProduct"), "ann_recall cartesian")
    assert("BroadcastNestedLoopJoin".r.findAllIn(ann).size == 1,
      "ann_recall must have exactly one nested-loop join (the brute arm)")
    assert(ann.contains("BroadcastHashJoin"), "LSH arm lost its hash join")
    // audit ops: top-N selection rides a bounded TakeOrdered, never a
    // global sort of the corpus; the threshold cross is broadcast
    val skew = Scale.auditKeySkew(spark, sf)
      .queryExecution.executedPlan.toString
    assert(skew.contains("TakeOrderedAndProject(limit=10"),
      "key-skew top-10 must be a bounded TakeOrdered")
    assert(!skew.contains("CartesianProduct"), "key-skew cartesian")
    val bal = Scale.auditShuffleBalance(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!bal.contains("Join"), "shuffle-balance should be join-free")
  }
}
