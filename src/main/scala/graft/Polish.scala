package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import Q._

/** Round-11 additions: content-defined-chunking dedup, l-diversity,
  * changepoint detection, Jarque-Bera normality, and the ORC scan
  * round-trip. All fully DuckDB-oracle-checked. */
object Polish {

  // ---------- content-defined chunking dedup ----------

  /** Rolling-hash parameters shared verbatim by the Spark plan and the
    * DuckDB oracle: window 8 chars, base-257 polynomial mod 1e9+7,
    * boundary where the window hash ≡ 0 (mod 64) → expected ~64-char
    * chunks at the test corpus (production tunes the mask up for KB/MB
    * chunks with the identical plan). Powers precomputed so the hash is
    * one 8-term linear expression — no per-position fold. */
  private val CdcWin = 8
  private val CdcP = 1000000007L
  private val CdcMask = 64L
  private val CdcPow: IndexedSeq[Long] = {
    val b = 257L
    (0 until CdcWin).scanLeft(1L)((acc, _) => acc * b % CdcP).take(CdcWin)
  }

  /** Content-defined-chunking dedup (the LBFS/rsync/backup-storage
    * recipe, here over text): chunk boundaries are set by CONTENT (the
    * rolling hash), not offsets, so an insertion early in a near-copy
    * shifts every byte yet leaves later chunk digests identical — the
    * property fixed-size chunking (mm_chunk_manifest) lacks. Per doc:
    * chunk count, how many chunks' content first appeared in an EARLIER
    * doc, the duplicated character volume, and the dup fraction — the
    * "storage actually saved by dedup" accounting at ingest.
    *
    * Scale shape: chars → window hashes → boundaries → chunks are all
    * per-row expression work (one O(8·len) pass, no UDF); accounting
    * reduces to a (doc, digest)-level table, one digest-keyed join of
    * two REDUCED tables (first-doc table is digest-bounded), one
    * doc-keyed reduce. No corpus-scale join-back. */
  def dedupCdcChunks(s: SparkSession, d: String): DataFrame = {
    val hTerms = (0 until CdcWin)
      .map(j => s"element_at(cs, i + $j) * ${CdcPow(CdcWin - 1 - j)}L")
      .mkString(" + ")
    val chunks = t(s, d, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        // split('', -1) keeps a trailing "" element (Java split
        // semantics) whose ascii() is 0 — filter it so cs is exactly
        // the document's characters
        expr("transform(filter(split(text, ''), c -> c != ''), " +
          "c -> cast(ascii(c) as bigint))").as("cs"))
      // boundary END positions: window [i, i+7] (1-based) closes a chunk
      // at e = i+7 when its hash ≡ 0 mod 64. The filter-before-transform
      // keeps the sequence ascending for docs shorter than the window.
      .select(col("doc_id"), col("text"), expr(
        s"""transform(filter(
           |    transform(filter(sequence(1, greatest(size(cs) - ${CdcWin - 1}, 1)),
           |               i -> i <= size(cs) - ${CdcWin - 1}),
           |      i -> named_struct('e', cast(i + ${CdcWin - 1} as bigint),
           |                        'h', ($hTerms) % ${CdcP}L)),
           |    w -> w.h % ${CdcMask}L = 0),
           |  w -> w.e)""".stripMargin).as("bs"))
      // spans: consecutive boundary pairs (0 and len added); a trailing
      // boundary at len yields an empty span, dropped by the filter
      .select(col("doc_id"), col("text"), expr(
        """filter(zip_with(
          |    concat(array(0L), bs),
          |    concat(bs, array(cast(length(text) as bigint))),
          |    (a, b) -> named_struct('st', a, 'en', b)),
          |  p -> p.en > p.st)""".stripMargin).as("spans"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(spans, p -> substring(text, cast(p.st + 1 as int), cast(p.en - p.st as int)))"))
          .as(Seq("idx", "chunk")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"),
        length(col("chunk")).cast("long").as("clen"),
        md5(col("chunk").cast("binary")).as("digest"))
    val perDocDigest = chunks.groupBy("doc_id", "digest")
      .agg(count(lit(1)).as("cnt"), sum("clen").as("chars"))
    val firstDoc = perDocDigest.groupBy("digest")
      .agg(min("doc_id").as("fd"))
    perDocDigest.join(firstDoc, "digest")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_chunks"),
        sum(when(col("doc_id") > col("fd"), col("cnt")).otherwise(0L))
          .as("n_dup"),
        sum(when(col("doc_id") > col("fd"), col("chars")).otherwise(0L))
          .as("dup_chars"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_chunks"), 6))
      .orderBy("doc_id")
  }
  val dedupCdcChunksSql: String = {
    val hTerms = (0 until CdcWin)
      .map(j => s"cs[i + $j] * ${CdcPow(CdcWin - 1 - j)}")
      .mkString(" + ")
    raw"""WITH c0 AS (SELECT doc_id, text,
         |    list_transform(generate_series(1, length(text)),
         |      i -> CAST(unicode(text[i]) AS BIGINT)) AS cs
         |  FROM documents WHERE length(text) > 0),
         |b0 AS (SELECT doc_id, text,
         |    list_transform(list_filter(
         |      list_transform(list_filter(
         |          generate_series(1, greatest(len(cs) - ${CdcWin - 1}, 1)),
         |          i -> i <= len(cs) - ${CdcWin - 1}),
         |        i -> {'e': i + ${CdcWin - 1}, 'h': ($hTerms) % $CdcP}),
         |      w -> w.h % $CdcMask = 0), w -> w.e) AS bs
         |  FROM c0),
         |sp AS (SELECT doc_id, text,
         |    list_zip(list_prepend(0, bs),
         |             list_append(bs, length(text))) AS spans
         |  FROM b0),
         |ch AS (SELECT doc_id,
         |    substring(text, CAST(struct_extract(p, 1) + 1 AS INT),
         |      CAST(struct_extract(p, 2) - struct_extract(p, 1) AS INT)) AS chunk
         |  FROM sp, unnest(spans) AS t(p)
         |  WHERE struct_extract(p, 2) > struct_extract(p, 1)),
         |cd AS (SELECT doc_id, md5(chunk) AS digest,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(length(chunk)) AS BIGINT) AS chars
         |  FROM ch GROUP BY doc_id, md5(chunk)),
         |fd AS (SELECT digest, min(doc_id) AS fd FROM cd GROUP BY digest)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN doc_id > fd.fd THEN cnt ELSE 0 END) AS BIGINT)
         |    AS n_dup,
         |  CAST(sum(CASE WHEN doc_id > fd.fd THEN chars ELSE 0 END) AS BIGINT)
         |    AS dup_chars,
         |  round(CAST(sum(CASE WHEN doc_id > fd.fd THEN cnt ELSE 0 END)
         |    AS DOUBLE) / sum(cnt), 6) AS dup_frac
         |FROM cd JOIN fd USING (digest) GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
  }

  // ---------- l-diversity privacy audit ----------

  private val DivL = 5

  /** l-diversity — the companion audit to [[Refine.privacyKAnonymity]]:
    * a quasi-identifier group can be k-anonymous yet leak everything if
    * all its members share one sensitive value. QI = (event_type,
    * hour-of-day); sensitive attribute = user cohort (user_id mod 100 —
    * a stand-in for any categorical payload). Emits per-group size,
    * distinct-sensitive-value count l, and the l ≥ $DivL verdict. One
    * keyed aggregation to a 5×24-bounded table. */
  def privacyLDiversity(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"),
        pmod(col("user_id"), lit(100L)).as("cohort"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("cohort")).as("l"))
      .withColumn("diverse", col("l") >= DivL)
      .orderBy("event_type", "hr")
  val privacyLDiversitySql: String =
    s"""SELECT event_type,
       |  CAST(date_part('hour', ts) AS BIGINT) AS hr,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(count(DISTINCT user_id % 100) AS BIGINT) AS l,
       |  count(DISTINCT user_id % 100) >= $DivL AS diverse
       |FROM events GROUP BY event_type, date_part('hour', ts)
       |ORDER BY event_type, hr""".stripMargin

  // ---------- CUSUM changepoint ----------

  /** Single most-likely changepoint in the daily event-count series —
    * the argmax of the centered cumulative sum (the offline CUSUM
    * estimator): where |Σ(yₜ − ȳ)| peaks, the mean shifted. Emits the
    * day, the peak deviation, and the pre/post means. The series table
    * is calendar-bounded, so the unpartitioned ranking window is safe
    * by construction; the cumulative sum is exact (integer cumsum minus
    * t·ȳ — no sequential double accumulation). */
  def eventChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint() // calendar-bounded
    val byDay = Window.orderBy("day")
    val tot = daily.agg(sum("y").as("tot"), count(lit(1)).as("nd"))
    val cum = daily
      .withColumn("cy", sum("y").over(
        byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(byDay).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("s_dev",
        col("cy").cast("double")
          - col("t").cast("double") * col("tot") / col("nd"))
    val pick = Window.orderBy(abs(col("s_dev")).desc, col("day"))
    cum.withColumn("rk", row_number().over(pick)).filter(col("rk") === 1)
      .select(col("day").as("cp_day"),
        round(col("s_dev"), 6).as("cusum_dev"),
        round(col("cy").cast("double") / col("t"), 6).as("pre_mean"),
        round((col("tot") - col("cy")).cast("double")
          / (col("nd") - col("t")), 6).as("post_mean"),
        round((col("tot") - col("cy")).cast("double") / (col("nd") - col("t"))
          - col("cy").cast("double") / col("t"), 6).as("mean_shift"))
  }
  val eventChangepointSql: String =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY date_trunc('day', ts)),
      |tot AS (SELECT CAST(sum(y) AS BIGINT) AS tot,
      |    CAST(count(*) AS BIGINT) AS nd FROM daily),
      |cum AS (SELECT day, y,
      |    CAST(sum(y) OVER (ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |dev AS (SELECT day, cy, t, tot, nd,
      |    CAST(cy AS DOUBLE) - CAST(t AS DOUBLE) * tot / nd AS s_dev
      |  FROM cum CROSS JOIN tot)
      |SELECT day AS cp_day, round(s_dev, 6) AS cusum_dev,
      |  round(CAST(cy AS DOUBLE) / t, 6) AS pre_mean,
      |  round(CAST(tot - cy AS DOUBLE) / (nd - t), 6) AS post_mean,
      |  round(CAST(tot - cy AS DOUBLE) / (nd - t)
      |    - CAST(cy AS DOUBLE) / t, 6) AS mean_shift
      |FROM dev ORDER BY abs(s_dev) DESC, day LIMIT 1""".stripMargin

  // ---------- Jarque-Bera normality test ----------

  /** Jarque-Bera normality statistic per event type over `value` —
    * JB = n/6·(S² + (K−3)²/4) from the first four power sums. Each
    * per-row power is computed in double (deterministic scalar) then
    * decimal-quantized so every sum is aggregation-order-independent;
    * the moment assembly is the same fixed double tree in both engines.
    * One keyed reduce; output is |event_type|-bounded. */
  def statJarqueBera(s: SparkSession, d: String): DataFrame = {
    val x = col("value")
    def dsumPow(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 12))).cast(DoubleType)
    val agg = t(s, d, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        dsumPow(x).as("s1"),
        dsumPow(x * x).as("s2"),
        dsumPow(x * x * x).as("s3"),
        dsumPow(x * x * x * x).as("s4"))
    val n = col("n").cast("double")
    val m = col("s1") / n
    val mu2 = col("s2") / n - m * m
    val mu3 = col("s3") / n - lit(3.0) * m * (col("s2") / n) +
      lit(2.0) * m * m * m
    val mu4 = col("s4") / n - lit(4.0) * m * (col("s3") / n) +
      lit(6.0) * m * m * (col("s2") / n) - lit(3.0) * m * m * m * m
    val sk = mu3 / pow(mu2, 1.5)
    val ku = mu4 / (mu2 * mu2)
    agg.select(col("event_type"), col("n"),
        round(sk, 6).as("skewness"),
        round(ku, 6).as("kurtosis"),
        round(n / lit(6.0)
          * (sk * sk + (ku - lit(3.0)) * (ku - lit(3.0)) / lit(4.0)), 6)
          .as("jb"))
      .orderBy("event_type")
  }
  val statJarqueBeraSql: String =
    """WITH a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(value * value * value AS DECIMAL(38,12))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(value * value * value * value AS DECIMAL(38,12))) AS DOUBLE) AS s4
      |  FROM events GROUP BY event_type),
      |m AS (SELECT event_type, n,
      |    s1 / n AS m1, s2 / n AS r2, s3 / n AS r3, s4 / n AS r4
      |  FROM a),
      |mu AS (SELECT event_type, n,
      |    r2 - m1 * m1 AS mu2,
      |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS mu3,
      |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
      |      - 3.0 * m1 * m1 * m1 * m1 AS mu4
      |  FROM m)
      |SELECT event_type, n,
      |  round(mu3 / pow(mu2, 1.5), 6) AS skewness,
      |  round(mu4 / (mu2 * mu2), 6) AS kurtosis,
      |  round(CAST(n AS DOUBLE) / 6.0
      |    * ((mu3 / pow(mu2, 1.5)) * (mu3 / pow(mu2, 1.5))
      |       + (mu4 / (mu2 * mu2) - 3.0) * (mu4 / (mu2 * mu2) - 3.0) / 4.0),
      |    6) AS jb
      |FROM mu ORDER BY event_type""".stripMargin

  // ---------- ORC scan round-trip ----------

  /** ORC write + read-back (Spark-native columnar format beyond
    * parquet/csv/json/avro/arrow — reference exposes a pluggable listing
    * format surface, context.py:1062): the aggregate over the ORC copy
    * must equal the oracle's aggregate over the original table. */
  def scanOrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/supplier_orc"
    t(s, d, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .groupBy(col("s_nationkey").cast("long").as("s_nationkey"))
      .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total_bal"),
        min(col("s_name")).as("first_name"),
        max(col("s_suppkey")).as("last_key"))
      .orderBy("s_nationkey")
  }
  val scanOrcRoundtripSql: String =
    s"""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       |  CAST(count(*) AS BIGINT) AS n, ${DSUM("s_acctbal")} AS total_bal,
       |  min(s_name) AS first_name, max(s_suppkey) AS last_key
       |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---------- RAKE keyword extraction ----------

  private val RakeStops: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** RAKE (Rapid Automatic Keyword Extraction) top-3 keyphrases per
    * document: candidate phrases are maximal stopword-free word runs;
    * each word scores degree/frequency (degree = summed length of the
    * phrase instances containing it), and a phrase scores the sum of its
    * words' scores. Per-word ratios are decimal-quantized before the
    * phrase sum so the aggregation is order-independent and the DuckDB
    * oracle matches bit-for-bit. Topology: one per-doc window for phrase
    * ids, then (doc, phrase)- and (doc, word)-keyed reduces and joins —
    * everything doc-partitioned, top-3 via a ranked window. */
  def textRakeKeywords(s: SparkSession, d: String): DataFrame = {
    val stopList = RakeStops.map(w => s"'$w'").mkString(", ")
    val occ = t(s, d, "documents")
      .select(col("doc_id"),
        posexplode(expr("split(trim(text), '\\\\s+')")).as(Seq("pos", "w")))
      .withColumn("stop", expr(s"w IN ($stopList)"))
      .withColumn("pid",
        sum(when(col("stop"), 1L).otherwise(0L)).over(
          Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(!col("stop"))
      .select(col("doc_id"), col("pid"), col("pos").cast("long").as("pos"),
        col("w"))
      .localCheckpoint() // consumed by phrase, degree, and score stages
    val phrases = occ.groupBy("doc_id", "pid")
      .agg(count(lit(1)).as("plen"),
        concat_ws(" ", expr("transform(array_sort(" +
          "collect_list(struct(pos, w))), p -> p.w)")).as("phrase"))
    val wordStats = occ.join(
        phrases.select(col("doc_id"), col("pid"), col("plen")),
        Seq("doc_id", "pid"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore",
        (col("deg").cast("double") / col("freq")).cast(DecimalType(38, 12)))
    val pscore = occ.join(wordStats.select("doc_id", "w", "wscore"),
        Seq("doc_id", "w"))
      .groupBy("doc_id", "pid")
      .agg(sum("wscore").as("psum"))
    val rk = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("phrase"))
    phrases.join(pscore, Seq("doc_id", "pid"))
      .select(col("doc_id"), col("phrase"),
        col("psum").cast("double").as("score"))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("phrase"),
        round(col("score"), 6).as("score"))
      .orderBy("doc_id", "rank")
  }
  val textRakeKeywordsSql: String = {
    val stopList = RakeStops.map(w => s"'$w'").mkString(", ")
    raw"""WITH w0 AS (SELECT doc_id, pos, w,
         |    w IN ($stopList) AS stop
         |  FROM (SELECT doc_id, i AS pos, ws[i] AS w
         |    FROM (SELECT doc_id,
         |        string_split_regex(trim(text), '\s+') AS ws
         |      FROM documents),
         |      unnest(generate_series(1, len(ws))) AS t(i))),
         |p0 AS (SELECT doc_id, pos, w, stop,
         |    sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS UNBOUNDED PRECEDING) AS pid
         |  FROM w0),
         |occ AS (SELECT doc_id, pid, CAST(pos AS BIGINT) AS pos, w
         |  FROM p0 WHERE NOT stop),
         |ph AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen,
         |    string_agg(w, ' ' ORDER BY pos) AS phrase
         |  FROM occ GROUP BY doc_id, pid),
         |ws AS (SELECT occ.doc_id, occ.w,
         |    CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(plen) AS BIGINT) AS deg
         |  FROM occ JOIN ph USING (doc_id, pid)
         |  GROUP BY occ.doc_id, occ.w),
         |sc AS (SELECT doc_id, w,
         |    CAST(CAST(deg AS DOUBLE) / freq AS DECIMAL(38,12)) AS wscore
         |  FROM ws),
         |ps AS (SELECT occ.doc_id, occ.pid, sum(wscore) AS psum
         |  FROM occ JOIN sc USING (doc_id, w)
         |  GROUP BY occ.doc_id, occ.pid),
         |ranked AS (SELECT ph.doc_id, ph.phrase,
         |    CAST(psum AS DOUBLE) AS score,
         |    CAST(row_number() OVER (PARTITION BY ph.doc_id
         |      ORDER BY CAST(psum AS DOUBLE) DESC, ph.phrase) AS BIGINT)
         |      AS rank
         |  FROM ph JOIN ps USING (doc_id, pid))
         |SELECT doc_id, rank, phrase, round(score, 6) AS score
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  }

  // ---------- Hurst exponent (rescaled range) ----------

  /** Hurst exponent of the daily event-count series via the classic
    * rescaled-range (R/S) two-scale estimate: segment the series at
    * m = 8 and m = 16 days, compute each segment's cumulative-deviation
    * range over its standard deviation, average per scale (per-segment
    * ratios decimal-quantized so the mean is order-independent), and
    * slope the two points on the log-log line — H = log2(RS₁₆/RS₈).
    * H ≈ 0.5 for an uncorrelated series, > 0.5 for persistent ones. All
    * segment moments come from exact integer sums; the series table is
    * calendar-bounded so its ordering windows are safe by construction. */
  def statHurst(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("t",
        row_number().over(Window.orderBy("day")).cast("long"))
      .localCheckpoint() // calendar-bounded
    val n = daily.count()
    def rs(m: Int): DataFrame = {
      val k = n / m
      val seg = daily.filter(col("t") <= k * m)
        .withColumn("seg", ((col("t") - 1) / m).cast("long"))
        .withColumn("i", ((col("t") - 1) % m + 1).cast("long"))
      val moments = seg.groupBy("seg")
        .agg(sum("y").as("sy"), sum(col("y") * col("y")).as("syy"))
      seg.withColumn("cy", sum("y").over(
          Window.partitionBy("seg").orderBy("i")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .join(moments, "seg")
        .withColumn("dev", col("cy").cast("double")
          - col("i").cast("double") * col("sy") / m)
        .groupBy("seg")
        .agg(max("dev").as("dmax"), min("dev").as("dmin"),
          first(col("sy")).as("sy"), first(col("syy")).as("syy"))
        // a constant segment has sd = 0 AND range = 0: 0/0 = NaN would
        // throw on the ANSI NaN→DECIMAL cast. Null the divisor so the
        // segment drops out of the sum (its limiting R/S ratio is 0;
        // k stays the full segment count) — mirrored via nullif in SQL.
        .withColumn("sd", sqrt(greatest(lit(0d),
          col("syy").cast("double") / m
            - (col("sy").cast("double") / m) * (col("sy").cast("double") / m))))
        .select(col("seg"),
          ((col("dmax") - col("dmin")) / when(col("sd") > 0, col("sd")))
            .cast(DecimalType(38, 12)).as("rs"))
        .agg((sum("rs").cast("double") / k).as("avg_rs"))
    }
    val r8 = rs(8).withColumnRenamed("avg_rs", "rs8")
    val r16 = rs(16).withColumnRenamed("avg_rs", "rs16")
    r8.crossJoin(r16)
      .select(lit(n).as("n_days"),
        round(col("rs8"), 6).as("rs8"),
        round(col("rs16"), 6).as("rs16"),
        round(log2(col("rs16") / col("rs8")), 6).as("hurst"))
  }
  /** One rescaled-range CTE per scale — the m=8 and m=16 blocks differ
    * only in the constant, so both are generated from this template
    * (a fix applies once or not at all). nullif keeps a zero-variance
    * segment's 0/0 out of the DECIMAL cast, mirroring the Spark guard. */
  private def hurstRsCte(name: String, m: Int): String =
    s"""$name AS (
       |  SELECT sum(rs) / max(k) AS avg_rs FROM (
       |    SELECT CAST((dmax - dmin)
       |        / nullif(sqrt(greatest(CAST(syy AS DOUBLE) / $m
       |          - (CAST(sy AS DOUBLE) / $m) * (CAST(sy AS DOUBLE) / $m),
       |          0)), 0)
       |      AS DECIMAL(38,12)) AS rs,
       |      (SELECT n // $m FROM nn) AS k
       |    FROM (
       |      SELECT seg, max(dev) AS dmax, min(dev) AS dmin,
       |        max(sy) AS sy, max(syy) AS syy
       |      FROM (
       |        SELECT s.seg, s.i,
       |          CAST(sum(s.y) OVER (PARTITION BY s.seg ORDER BY s.i
       |            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
       |            - CAST(s.i AS DOUBLE) * m.sy / $m AS dev,
       |          m.sy, m.syy
       |        FROM (SELECT (t - 1) // $m AS seg, (t - 1) % $m + 1 AS i, y
       |          FROM idx WHERE t <= (SELECT n // $m FROM nn) * $m) s
       |        JOIN (SELECT (t - 1) // $m AS seg,
       |            CAST(sum(y) AS BIGINT) AS sy,
       |            CAST(sum(y * y) AS BIGINT) AS syy
       |          FROM idx WHERE t <= (SELECT n // $m FROM nn) * $m
       |          GROUP BY (t - 1) // $m) m USING (seg))
       |      GROUP BY seg)))""".stripMargin
  val statHurstSql: String =
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY date_trunc('day', ts)),
      |idx AS (SELECT y,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
      |${hurstRsCte("rs8", 8)},
      |${hurstRsCte("rs16", 16)}
      |SELECT (SELECT n FROM nn) AS n_days,
      |  round(CAST((SELECT avg_rs FROM rs8) AS DOUBLE), 6) AS rs8,
      |  round(CAST((SELECT avg_rs FROM rs16) AS DOUBLE), 6) AS rs16,
      |  round(log2(CAST((SELECT avg_rs FROM rs16) AS DOUBLE)
      |    / CAST((SELECT avg_rs FROM rs8) AS DOUBLE)), 6) AS hurst""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cdc_chunks" -> (dedupCdcChunks _),
    "privacy_l_diversity" -> (privacyLDiversity _),
    "event_changepoint" -> (eventChangepoint _),
    "stat_jarque_bera" -> (statJarqueBera _),
    "scan_orc_roundtrip" -> (scanOrcRoundtrip _),
    "text_rake_keywords" -> (textRakeKeywords _),
    "stat_hurst" -> (statHurst _))

  val oracle: Map[String, String] = Map(
    "dedup_cdc_chunks" -> dedupCdcChunksSql,
    "privacy_l_diversity" -> privacyLDiversitySql,
    "event_changepoint" -> eventChangepointSql,
    "stat_jarque_bera" -> statJarqueBeraSql,
    "scan_orc_roundtrip" -> scanOrcRoundtripSql,
    "text_rake_keywords" -> textRakeKeywordsSql,
    "stat_hurst" -> statHurstSql)
}
