package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the sketch/sampling/sequence operators — the
  * properties the DuckDB hash-compare cannot express (one-sided sketch
  * error, sampling bias direction, window coverage). */
class StatsSpec extends AnyFunSuite {
  import SparkSpec._

  test("CMS estimates are never below the exact count and mostly tight") {
    val rows = Stats.sketchCms(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt")),
      "CMS underestimated a key — impossible for a correct sketch")
    val tight = rows.count(r => r.getAs[Long]("est_cnt") == r.getAs[Long]("exact_cnt"))
    assert(tight.toDouble / rows.length >= 0.5,
      s"only $tight/${rows.length} exact at width 256 — hashing is broken")
  }

  test("bloom filter has no false negatives and a bounded false-positive rate") {
    val rows = Stats.sketchBloom(spark, sf).collect()
    val withOrders = rows.filter(_.getAs[Long]("has_orders") == 1L)
    assert(withOrders.nonEmpty)
    assert(withOrders.forall(_.getAs[Long]("maybe_present") == 1L),
      "bloom false negative — impossible for a correct filter")
    val absent = rows.filter(_.getAs[Long]("has_orders") == 0L)
    if (absent.length >= 20) {
      val fp = absent.count(_.getAs[Long]("maybe_present") == 1L)
      assert(fp.toDouble / absent.length <= 0.5,
        s"false-positive rate $fp/${absent.length} — far above the k=4,m=8192 design point")
    }
  }

  test("HLL estimate lands within the m=64 error envelope") {
    val rows = Stats.sketchHll(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val est = r.getAs[Double]("hll_users")
      assert(est > 0.0)
      // 1.04/sqrt(64) = 13% std error; 30% is a generous 2.3-sigma gate
      assert(math.abs(est - exact) / exact <= 0.30,
        s"${r.getString(0)}: HLL $est vs exact $exact drifts past 30%")
    }
  }

  test("ACF values are bounded and pair counts respect the series size") {
    val rows = Stats.statAcf(spark, sf).collect()
    assert(rows.length == 24)
    assert(rows.forall(r => math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9))
    // n_pairs(k) = |{h : h and h-k both observed}|. On a gapped hourly grid
    // this is NOT monotone in k (nor <= n-k); the tight safe bound is n-1,
    // since the earliest observed hour can never be the right end of a pair.
    val n = Q.t(spark, sf, "events")
      .selectExpr("unix_seconds(date_trunc('HOUR', ts)) div 3600 AS h")
      .distinct().count()
    rows.foreach { r =>
      val np = r.getAs[Long]("n_pairs")
      assert(np > 0L && np <= n - 1, s"lag ${r.getAs[Long]("lag")}: n_pairs $np vs n $n")
    }
  }

  test("association rules have consistent supports and bounded confidence") {
    val rows = Stats.assocRules(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val pair = r.getAs[Long]("pair_orders")
      assert(pair <= r.getAs[Long]("supp_a") && pair <= r.getAs[Long]("supp_b"),
        "a pair cannot out-support its items")
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
    }
    val counts = rows.map(_.getAs[Long]("pair_orders"))
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
  }

  test("priority sampling returns K rows biased toward heavy documents") {
    val sample = Stats.sampleWeighted(spark, sf).collect()
    assert(sample.length == 100)
    val sampleMean = sample.map(_.getAs[Long]("n_chars").toDouble).sum / sample.length
    val corpusMean = Q.t(spark, sf, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("decile bins partition the orders with near-equal support") {
    val bins = Stats.binQuantile(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == (1L to 10L))
    val total = Q.t(spark, sf, "orders").count()
    assert(bins.map(_.getAs[Long]("n")).sum == total)
    val sizes = bins.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1, "ntile bins must differ by at most one row")
    // bins are ordered ranges: each bin's lo is >= the previous bin's hi
    val byBin = bins.sortBy(_.getAs[Long]("bin"))
    byBin.sliding(2).foreach { w =>
      assert(w(1).getAs[Double]("lo") >= w(0).getAs[Double]("hi"))
    }
  }

  test("markov transition probabilities sum to one per source state") {
    val sums = Stats.eventMarkov(spark, sf)
      .groupBy(col("event_type")).agg(sum(col("prob")).as("p"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("p") - 1.0) < 1e-4,
        s"${r.getString(0)} rows sum to ${r.getAs[Double]("p")}")
    }
  }

  test("sliding windows cover each event exactly twice") {
    val windowed = Stats.eventSlidingWindow(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    val events = Q.t(spark, sf, "events").count()
    assert(windowed == 2 * events,
      s"2h/1h hopping windows must double-count: $windowed vs ${2 * events}")
  }

  test("correlation matrix diagonal is exactly one after rounding") {
    val m = Stats.statCorrMatrix(spark, sf).collect()
    assert(m.length == 10) // 4 measures -> 6 pairs + 4 diagonal
    val diag = m.filter(r => r.getString(0) == r.getString(1))
    assert(diag.length == 4)
    diag.foreach(r => assert(r.getAs[Double]("corr") == 1.0))
    m.foreach(r => assert(math.abs(r.getAs[Double]("corr")) <= 1.0))
  }

  test("toleranced as-of join only differs from the plain join beyond tolerance") {
    val plain = Pipeline.joinAsof(spark, sf)
      .select(col("event_id"), col("ts"), col("match_event_id"), col("match_ts"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val tol = Stats.joinAsofTolerance(spark, sf).collect()
    assert(tol.length == plain.size)
    var beyond = 0
    tol.foreach { r =>
      val p = plain(r.getAs[Long]("event_id"))
      if (r.isNullAt(r.fieldIndex("match_event_id"))) {
        // either no match at all, or the plain match was older than 30 min
        if (!p.isNullAt(2)) {
          val gapMs = p.getAs[java.sql.Timestamp](1).getTime -
            p.getAs[java.sql.Timestamp](3).getTime
          assert(gapMs > 30 * 60 * 1000L, s"nulled a within-tolerance match: $r")
          beyond += 1
        }
      } else {
        assert(r.getAs[Long]("match_event_id") == p.getAs[Long]("match_event_id"))
      }
    }
    assert(beyond > 0, "corpus produced no beyond-tolerance matches — tolerance untested")
  }

  test("merge-schema scan surfaces the added column as null for old files") {
    val rows = Stats.scanMergeSchema(spark, sf).collect()
    val (a, b) = rows.partition(_.getAs[String]("v") == "a")
    assert(a.nonEmpty && b.nonEmpty)
    assert(a.forall(_.isNullAt(2)), "v=a files predate `extra` — must read as null")
    assert(b.forall(!_.isNullAt(2)))
  }

  test("lag features: prev-day nulls across gaps, ma7 bounded by window extremes") {
    val rows = Stats.eventLagFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("d").getTime)
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("v_lag1")))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          val gapDays = (cur.getAs[java.sql.Timestamp]("d").getTime -
            prev.getAs[java.sql.Timestamp]("d").getTime) / 86400000L
          val prevDayIdx = cur.fieldIndex("v_prev_day")
          if (gapDays == 1)
            assert(cur.getAs[Double](prevDayIdx) == prev.getAs[Double]("v"),
              s"consecutive-day lag broken: $cur")
          else
            assert(cur.isNullAt(prevDayIdx),
              s"v_prev_day must null across a $gapDays-day gap: $cur")
          // v_lag1 always carries the previous observation
          assert(cur.getAs[Double]("v_lag1") == prev.getAs[Double]("v"))
        case _ => ()
      }
      sorted.zipWithIndex.foreach { case (r, i) =>
        val window = sorted.slice(math.max(0, i - 6), i + 1).map(_.getAs[Double]("v"))
        val ma = r.getAs[Double]("v_ma7")
        assert(ma >= window.min - 1e-6 && ma <= window.max + 1e-6,
          s"ma7 outside window extremes: $r")
      }
    }
  }

  test("seasonal decomposition reconstructs x and nulls trend at series edges") {
    val rows = Stats.eventSeasonal(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
      // first/last 12 hours have incomplete 25h frames -> null trend
      (sorted.take(12) ++ sorted.takeRight(12)).foreach(r =>
        assert(r.isNullAt(r.fieldIndex("trend")), s"edge trend must be null: $r"))
      sorted.drop(12).dropRight(12).foreach { r =>
        assert(!r.isNullAt(r.fieldIndex("trend")))
        // additive identity: x = trend + seasonal + residual (to rounding)
        val x = r.getAs[Long]("x").toDouble
        val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
          r.getAs[Double]("residual")
        assert(math.abs(x - recon) < 1e-4, s"decomposition broken: $r")
      }
      // one seasonal value per hour-of-day
      assert(rs.map(_.getAs[Double]("seasonal")).distinct.length <= 24)
    }
  }

  test("CUSUM kernel matches a replayed recursion and alarms are non-degenerate") {
    val rows = Stats.eventCusum(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("s_hi") >= 0.0 && r.getAs[Double]("s_lo") >= 0.0)
    }
    // replay the recursion in Scala from the raw hourly series and compare
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
      val xs = sorted.map(_.getAs[Long]("x").toDouble)
      val n = xs.length
      val s1 = xs.sum; val s2 = xs.map(v => v * v).sum
      val mu = s1 / n
      val sigma = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
      var hi = 0.0; var lo = 0.0
      sorted.zip(xs).foreach { case (r, x) =>
        val z = (x - mu) / sigma
        hi = math.max(0.0, hi + z - 0.5)
        lo = math.max(0.0, lo - z - 0.5)
        assert(math.abs(r.getAs[Double]("s_hi") - hi) < 1e-5 &&
          math.abs(r.getAs[Double]("s_lo") - lo) < 1e-5,
          s"kernel diverges from replayed recursion at $r")
      }
    }
    val alarms = rows.count(_.getAs[Boolean]("alarm"))
    assert(alarms > 0 && alarms < rows.length / 10,
      s"alarm rate $alarms/${rows.length} is degenerate")
  }
}

/** Spearman/Pearson cross-check against a driver-local recompute. */
class SpearmanSpec extends AnyFunSuite {
  import SparkSpec._

  test("spearman rho matches a local tie-averaged rank correlation") {
    val row = Stats.statSpearman(spark, sf).collect().head
    val m = Q.t(spark, sf, "events").groupBy("user_id")
      .agg(count(lit(1)).as("x"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .as("y"))
      .collect()
      .map(r => (r.getAs[Long]("x").toDouble,
        r.getAs[java.math.BigDecimal]("y").doubleValue()))
    def ranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.zipWithIndex.sortBy(_._1)
      val rk = new Array[Double](v.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j + 2) / 2.0
        (i to j).foreach(k => rk(sorted(k)._2) = avg)
        i = j + 1
      }
      rk.toSeq
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
        b.map(y => (y - mb) * (y - mb)).sum)
    }
    val rho = pearson(ranks(m.map(_._1)), ranks(m.map(_._2)))
    assert(math.abs(row.getAs[Double]("rho_spearman") - rho) < 1e-5,
      s"local $rho vs ${row.getAs[Double]("rho_spearman")}")
    assert(row.getAs[Long]("n_users") == m.length)
    val r = pearson(m.map(_._1), m.map(_._2))
    assert(math.abs(row.getAs[Double]("r_pearson") - r) < 1e-4)
    // spend is monotone-ish in activity: both correlations positive, and
    // all coefficients inside [-1, 1]
    assert(row.getAs[Double]("rho_spearman") > 0.0 &&
      row.getAs[Double]("rho_spearman") <= 1.0)
    assert(row.getAs[Double]("r_pearson") > 0.0 &&
      row.getAs[Double]("r_pearson") <= 1.0)
  }
}
