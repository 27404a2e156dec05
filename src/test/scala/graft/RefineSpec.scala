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
