package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Round-10 corpus-refinement operators: semantic deduplication
  * (SemDeDup-style cluster-bounded near-dup pruning over embeddings), a
  * hashing-trick linear quality scorer (the fastText-classifier shape),
  * a cross-source n-gram contamination matrix, and Wilson proportion
  * confidence intervals.
  *
  * Scale design (the 100 TB shapes):
  *  - `dedup_semantic` bounds the quadratic similarity stage by CLUSTER,
  *    not by LSH bucket: vectors collapse to distinct-content
  *    representatives, representatives are assigned to a k-seeded
  *    partitioning in one broadcast pass, and only same-cluster rep
  *    pairs are scored — Σ cᵢ² work on distinct content, never n². The
  *    full per-vector decision set is reconstructed exactly afterward.
  *  - `text_classifier_score` is map-only ahead of one keyed reduce:
  *    token → hashed bucket → weight is a pure expression (whole-stage
  *    codegen, no join, no UDF). A trained model would broadcast its
  *    weight vector; the deterministic hash-derived weights here keep
  *    the plumbing identical and the oracle exact.
  *  - `corpus_source_overlap` reduces the corpus to distinct
  *    (source, gram) keys first; the self-join's per-gram fanout is
  *    bounded by the source count, so the pair aggregation is
  *    |sources|²-bounded however large the corpus grows.
  *  - `stat_proportion_ci` is one map-side keyed reduce to an
  *    |event_type|-bounded table; the interval math runs there.
  *
  * Determinism: distances accumulate as DECIMAL(38,12) (order-free),
  * cosines use the same double fold as the dedup_embedding family
  * (hash-exact against DuckDB's `list_cosine_similarity`), hashes ride
  * the repo's md5-lane construction, and every surfaced double is a
  * fixed expression tree rounded at 6.
  */
object Refine {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  // ---------- semantic deduplication (SemDeDup) ----------

  private val SemK = 16
  private val SemTau = 0.35

  /** SemDeDup-style semantic pruning (Abbas et al. 2023, public paper;
    * the reference has no counterpart — this is pipeline-beyond-ref):
    * cluster the embedding space, and within each cluster drop every
    * vector that has a more-canonical (lower-id) neighbor with cosine ≥
    * τ, reporting which keeper it duplicates. Unlike `dedup_embedding`
    * (LSH-banded NEAR-duplicates at cos ≥ 0.95) this targets SEMANTIC
    * redundancy at a far looser τ, where LSH banding would need
    * impractically many planes to recall — bounding the pair stage by
    * k-means cluster instead is exactly the published algorithm's shape.
    *
    * Plan: distinct-content collapse (exact copies ride their
    * representative through every heavy stage — at real duplication
    * rates most of the corpus does); one broadcast seed-assignment pass
    * (k lowest-id vectors as centroids, exact-decimal distances, ties to
    * the lowest cluster id); same-cluster rep pairs scored with the
    * double cosine fold; then the per-vector decision is reconstructed:
    * non-representative copies drop with their representative as keeper
    * (cos 1.0 outranks any cross pair), and each remaining vector keeps
    * the highest-cosine lower-id neighbor (ties to the lowest id). */
  def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    val vecs = t(s, d, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .localCheckpoint() // read for groups, seeds, and member expansion
    val members = vecs.groupBy("v").agg(min("vec_id").as("rep"))
      .join(vecs, "v") // (v, rep, vec_id): every member knows its rep
      .select(col("vec_id"), col("rep"))
      .localCheckpoint()
    val reps = vecs.join(members.filter(col("vec_id") === col("rep"))
      .select(col("vec_id")), "vec_id")
      .select(col("vec_id").as("rep"), col("v"))
      .localCheckpoint()
    // seed centroids: the K lowest member ids (TakeOrdered, no full sort)
    val seeds = vecs.orderBy("vec_id").limit(SemK)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val e = reps.select(col("rep"), posexplode(col("v")).as(Seq("i0", "x")))
      .select(col("rep"), (col("i0") + 1).as("i"), col("x"))
    val c0 = seeds.select(col("cid"), posexplode(col("cv")).as(Seq("i0", "cx")))
      .select(col("cid"), (col("i0") + 1).as("i"), col("cx"))
    // assignment: map-side k-way expansion + keyed reduce, decimal argmin
    val dist = e.join(broadcast(c0), "i")
      .groupBy("rep", "cid")
      .agg(sum(((col("x") - col("cx")) * (col("x") - col("cx")))
        .cast(DecimalType(38, 12))).as("dist"))
    val aw = Window.partitionBy("rep").orderBy(col("dist"), col("cid"))
    val asg = dist.withColumn("rn", row_number().over(aw))
      .filter(col("rn") === 1).select("rep", "cid")
    // same-cluster rep pairs above τ — the cluster-bounded quadratic
    // stage. Norms fold ONCE per rep (a column, not a per-pair
    // recomputation); nrm1·nrm2 is bit-identical to folding both norms
    // inside the pair row, so the oracle's per-pair formula still
    // hash-matches.
    val rv = reps.withColumn("nrm", norm2(col("v"))).join(asg, "rep")
    val pairs = rv.as("a").join(rv.as("b"),
        col("a.cid") === col("b.cid") && col("a.rep") < col("b.rep"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) /
        (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= SemTau)
      .select(col("a.rep").as("r1"), col("b.rep").as("r2"), col("cos"))
    // reconstruct per-vector candidates: cross pairs via rep membership
    // (both directions — the keeper is whichever member id is lower),
    // within-group copies via their representative at cos 1.0
    val cross = pairs
      .join(members.select(col("rep").as("r1"), col("vec_id").as("m1")), "r1")
      .join(members.select(col("rep").as("r2"), col("vec_id").as("m2")), "r2")
      .select(greatest(col("m1"), col("m2")).as("vid"),
        least(col("m1"), col("m2")).as("k"), col("cos"))
    val within = members.filter(col("vec_id") =!= col("rep"))
      .select(col("vec_id").as("vid"), col("rep").as("k"),
        lit(1.0).as("cos"))
    val sel = Window.partitionBy("vid").orderBy(col("cos").desc, col("k"))
    cross.unionByName(within)
      .withColumn("rn", row_number().over(sel)).filter(col("rn") === 1)
      .join(members.select(col("vec_id").as("vid"), col("rep")), "vid")
      .join(asg, "rep")
      .select(col("vid").as("vec_id"), col("cid"), col("k").as("keeper"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id")
  }
  val dedupSemanticSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |ex AS (SELECT vec_id, i, e[i] AS x
       |  FROM v, unnest(generate_series(1, len(e))) AS t(i)),
       |seeds AS (SELECT vec_id FROM v ORDER BY vec_id LIMIT $SemK),
       |c0 AS (SELECT vec_id AS cid, i, x AS cx FROM ex
       |  WHERE vec_id IN (SELECT vec_id FROM seeds)),
       |dist AS (SELECT ex.vec_id, c0.cid,
       |    sum(CAST((ex.x - c0.cx) * (ex.x - c0.cx) AS DECIMAL(38,12))) AS dist
       |  FROM ex JOIN c0 USING (i) GROUP BY ex.vec_id, c0.cid),
       |asg AS (SELECT vec_id, cid FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM dist) WHERE rn = 1),
       |p AS (SELECT bb.vec_id AS vid, aa.cid, aa.vec_id AS k,
       |    list_cosine_similarity(va.e, vb.e) AS cos
       |  FROM asg aa JOIN asg bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
       |  JOIN v va ON va.vec_id = aa.vec_id
       |  JOIN v vb ON vb.vec_id = bb.vec_id
       |  WHERE list_cosine_similarity(va.e, vb.e) >= $SemTau)
       |SELECT vid AS vec_id, cid, k AS keeper, round(cos, 6) AS cos_sim
       |FROM (SELECT *, row_number() OVER
       |    (PARTITION BY vid ORDER BY cos DESC, k) AS rn FROM p)
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  // ---------- hashing-trick linear quality scorer ----------

  private val HashDim = 4096

  /** fastText-shaped linear document scorer with the hashing trick:
    * token → md5-lane bucket (mod 4096) → per-bucket weight → the doc
    * score is the weight sum normalized by √n, squashed by a sigmoid.
    * The weights here derive deterministically from the bucket id (a
    * Knuth multiplicative hash into (−1, 1]) — a stand-in for trained
    * coefficients so the oracle can verify the FULL scoring plumbing
    * exactly; a production model broadcasts its weight array into the
    * same expression. Map-only ahead of one per-doc reduce, whole-stage
    * codegen throughout (no UDF, no join). */
  def textClassifierScore(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents").select(col("doc_id"),
      explode(expr("filter(split(lower(trim(text)), '\\\\s+'), x -> x != '')"))
        .as("tok"))
    val b = expr(
      s"cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint) % $HashDim")
    val scored = toks.withColumn("w",
      ((b * lit(2654435761L)) % lit(2001L) - lit(1000L)).cast("double") / 1000.0)
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("ws"))
      .withColumn("score", round(col("ws") / sqrt(col("n_tokens")), 6))
      .withColumn("prob",
        round(lit(1.0) / (lit(1.0) + exp(-col("score"))), 6))
      .withColumn("keep", (col("score") > 0).cast("boolean"))
      .select("doc_id", "n_tokens", "score", "prob", "keep")
      .orderBy("doc_id")
  }
  val textClassifierScoreSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, t.tok FROM documents,
       |    unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> x != '')) AS t(tok)),
       |w AS (SELECT doc_id,
       |    CAST((('0x' || substr(md5(tok), 1, 15))::BIGINT % $HashDim)
       |      * 2654435761 % 2001 - 1000 AS DOUBLE) / 1000.0 AS w
       |  FROM toks),
       |agg AS (SELECT doc_id, count(*) AS n_tokens,
       |    round(sum(w) / sqrt(count(*)), 6) AS score
       |  FROM w GROUP BY doc_id)
       |SELECT doc_id, n_tokens, score,
       |  round(1.0 / (1.0 + exp(-score)), 6) AS prob,
       |  score > 0 AS keep
       |FROM agg ORDER BY doc_id""".stripMargin

  // ---------- cross-source contamination matrix ----------

  /** Shared word-3-gram overlap between every source pair — the
    * contamination matrix a pipeline consults before declaring two
    * crawls independent (or before using one source as an eval set for
    * a model trained on another). The corpus reduces to DISTINCT
    * (source, gram) keys first; the gram-keyed self-join's fanout per
    * gram is bounded by the source count, so the pair table is
    * |sources|²-bounded regardless of corpus size. */
  def corpusSourceOverlap(s: SparkSession, d: String): DataFrame = {
    // words bound to a lambda variable so the split runs once per row
    // (inline element_at(split(...), i) re-splits per gram — O(words²))
    val grams = t(s, d, "documents").select(col("source"), explode(expr(
      """transform(array(split(trim(text), '\\s+')), w ->
        |  array_distinct(transform(
        |    sequence(1, greatest(size(w) - 2, 1)),
        |    i -> concat(element_at(w, i), ' ',
        |                element_at(w, i + 1), ' ',
        |                element_at(w, i + 2)))))[0]"""
        .stripMargin)).as("g"))
      .distinct()
      .localCheckpoint() // read for totals and both join sides
    val tot = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(tot.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(tot.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"),
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6).as("jaccard"))
      .orderBy("src_a", "src_b")
  }
  val corpusSourceOverlapSql: String =
    raw"""WITH grams AS (
         |  SELECT DISTINCT source, t.g FROM documents,
         |    unnest(list_distinct(list_transform(
         |      generate_series(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1)),
         |      i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
         |           string_split_regex(trim(text), '\s+')[i + 1] || ' ' ||
         |           string_split_regex(trim(text), '\s+')[i + 2]))) AS t(g)),
         |tot AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
         |shared AS (SELECT a.source AS src_a, b.source AS src_b,
         |    count(*) AS shared
         |  FROM grams a JOIN grams b
         |    ON a.g = b.g AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT src_a, src_b, shared,
         |  round(CAST(shared AS DOUBLE) / (ta.n + tb.n - shared), 6) AS jaccard
         |FROM shared
         |JOIN tot ta ON ta.source = src_a
         |JOIN tot tb ON tb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin

  // ---------- Wilson proportion confidence intervals ----------

  /** Wilson-score 95% confidence interval for the per-event-type
    * proportion of high-value events (value > 80) — the interval that
    * stays inside [0,1] at extreme p̂, unlike the normal approximation.
    * One map-side keyed reduce to an |event_type|-bounded table; the
    * closed-form interval runs on that table. */
  def statProportionCi(s: SparkSession, d: String): DataFrame = {
    val z = 1.96
    val agg = t(s, d, "events").groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 80, 1L).otherwise(0L)).as("hits"))
    val nD = col("n").cast("double"); val p = col("hits") / nD
    val denom = lit(1.0) + lit(z * z) / nD
    val center = (p + lit(z * z) / (nD * 2)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z * z) / (nD * nD * 4))) / denom
    agg.select(col("event_type"), col("n"), col("hits"),
        round(p, 6).as("p_hat"),
        round(center - half, 6).as("ci_lo"),
        round(center + half, 6).as("ci_hi"))
      .orderBy("event_type")
  }
  val statProportionCiSql: String =
    """WITH agg AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(CASE WHEN value > 80 THEN 1 ELSE 0 END) AS BIGINT) AS hits
      |  FROM events GROUP BY event_type),
      |c AS (SELECT event_type, n, hits,
      |    CAST(hits AS DOUBLE) / n AS p,
      |    1.0 + 1.96 * 1.96 / n AS denom FROM agg)
      |SELECT event_type, n, hits, round(p, 6) AS p_hat,
      |  round(((p + 1.96 * 1.96 / (2 * n))
      |    - 1.96 * sqrt(p * (1.0 - p) / n + 1.96 * 1.96 / (4.0 * n * n)))
      |    / denom, 6) AS ci_lo,
      |  round(((p + 1.96 * 1.96 / (2 * n))
      |    + 1.96 * sqrt(p * (1.0 - p) / n + 1.96 * 1.96 / (4.0 * n * n)))
      |    / denom, 6) AS ci_hi
      |FROM c ORDER BY event_type""".stripMargin

  // ---------- registry ----------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> (dedupSemantic _),
    "text_classifier_score" -> (textClassifierScore _),
    "corpus_source_overlap" -> (corpusSourceOverlap _),
    "stat_proportion_ci" -> (statProportionCi _))

  val oracle: Map[String, String] = Map(
    "dedup_semantic" -> dedupSemanticSql,
    "text_classifier_score" -> textClassifierScoreSql,
    "corpus_source_overlap" -> corpusSourceOverlapSql,
    "stat_proportion_ci" -> statProportionCiSql)
}
