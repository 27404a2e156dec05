package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the inferential / curriculum operators:
  * each distributed moment-or-grid topology is re-derived in plain
  * driver-side Scala from the collected sf0.001 corpus and must agree to
  * the statistic's rounding precision. */
class InferSpec extends AnyFunSuite {
  import SparkSpec._

  private lazy val docs =
    Q.t(spark, sf, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
  private lazy val events =
    Q.t(spark, sf, "events").select("ts", "event_type", "value").collect()

  test("one-way ANOVA F and eta^2 match brute force") {
    val row = Infer.statAnova(spark, sf).collect().head
    val groups = docs.groupBy(_.getAs[String]("source"))
      .map(_._2.map(_.getAs[Long]("n_chars").toDouble).toSeq).toSeq
    val n = groups.map(_.length).sum.toDouble
    val k = groups.length.toDouble
    val grand = groups.flatten.sum / n
    val ssb = groups.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }).sum
    val f = ((n - k) / (k - 1)) * ssb / ssw
    assert(row.getAs[Long]("n") == n.toLong)
    assert(row.getAs[Long]("k") == k.toLong)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-3,
      s"F ${row.getAs[Double]("f_stat")} vs brute $f")
    assert(math.abs(row.getAs[Double]("eta_sq") - ssb / (ssb + ssw)) < 1e-6)
  }

  test("ROC AUC matches the brute-force tie-aware rank formulation") {
    val row = Infer.statAuc(spark, sf).collect().head
    val scored = events.map(r => (math.round(r.getAs[Double]("value") * 100),
      r.getAs[String]("event_type") == "purchase"))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var num = 0.0
    for (p <- pos; q <- neg)
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val auc = num / (pos.length.toDouble * neg.length)
    assert(row.getAs[Long]("n_pos") == pos.length.toLong)
    assert(row.getAs[Long]("n_neg") == neg.length.toLong)
    assert(math.abs(row.getAs[Double]("auc") - auc) < 1e-6,
      s"AUC ${row.getAs[Double]("auc")} vs brute $auc")
  }

  test("Theil-Sen slope is the median of brute-force pairwise slopes") {
    val row = Infer.statTheilSen(spark, sf).collect().head
    val daily = events.groupBy(r =>
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate)
      .map { case (d, v) => (d.toEpochDay, v.length.toLong) }.toSeq
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1)).sorted
    val nP = slopes.length
    val med = (slopes((nP - 1) / 2) + slopes(nP / 2)) / 2.0
    assert(row.getAs[Long]("n_pairs") == nP.toLong)
    assert(math.abs(row.getAs[Double]("theil_sen_slope") - med) < 1e-6,
      s"slope ${row.getAs[Double]("theil_sen_slope")} vs brute $med")
    // scale guard: the days²-pair median selection must ride the distPos
    // range-shuffle topology — every window in the plan is partitioned
    // (no unpartitioned global-sort WindowExec)
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Infer.statTheilSen(spark, sf).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan // AQE wrapper is a leaf
      case p => p
    }
    // r20: distPos assigns positions in a mapPartitions pass, so the
    // plan normally has NO WindowExec at all; the guard keeps forbidding
    // the unpartitioned global-sort form should one ever reappear
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned WindowExec in Theil-Sen plan:\n$plan")
  }

  test("Theil-Sen is invariant to spark.sql.shuffle.partitions") {
    // the distPos median selection derives its range-partition width from
    // the session conf; results must be identical at any width
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    val base = Infer.statTheilSen(spark, sf).collect().map(_.toString).toSeq
    try {
      conf.set("spark.sql.shuffle.partitions", "5")
      val narrow = Infer.statTheilSen(spark, sf).collect().map(_.toString).toSeq
      assert(narrow == base, "Theil-Sen drifted with the shuffle width")
    } finally conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("Poisson bootstrap CI brackets the corpus mean with ordered bounds") {
    val row = Infer.statBootstrapCi(spark, sf).collect().head
    val mean = docs.map(_.getAs[Long]("n_chars")).sum.toDouble / docs.length
    assert(row.getAs[Long]("b_reps") == 100L)
    assert(math.abs(row.getAs[Double]("mean_chars") - mean) < 1e-6)
    val lo = row.getAs[Double]("ci_lo")
    val hi = row.getAs[Double]("ci_hi")
    assert(lo < hi, s"CI not ordered: [$lo, $hi]")
    // Replicate means concentrate near the corpus mean: both bounds are
    // within a loose +-15% band (sigma/sqrt(n) is ~2% here).
    assert(lo > mean * 0.85 && hi < mean * 1.15, s"CI [$lo, $hi] vs $mean")
    assert(lo <= mean && mean <= hi,
      s"95% CI [$lo, $hi] does not bracket $mean")
  }

  test("curriculum stages partition the corpus like the ntile builtin") {
    val out = Infer.curriculumStages(spark, sf).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("docs")).sum == docs.length.toLong)
    // ntile split: first n%5 stages take one extra doc
    val n = docs.length
    val expected = (1 to 5).map(i =>
      (n / 5 + (if (i <= n % 5) 1 else 0)).toLong)
    assert(out.sortBy(_.getAs[Long]("stage")).map(_.getAs[Long]("docs"))
      .toSeq == expected)
    // stages are contiguous, non-overlapping length bands
    val sorted = out.sortBy(_.getAs[Long]("stage"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"),
        "stage bands overlap")
    }
  }
}
