package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** Remaining SURVEY.md §2 surface: sources/sinks beyond parquet (§2.1-2.2),
  * approx aggregates, UDF/UDAF (§2.12), and the native vector kernels
  * (§2.9 distance functions, backed by graft.functions.VectorKernels).
  */
object Extras {

  private def tmpDir(name: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/$name"
    dir
  }

  /** CSV round-trip: write with header/delimiter options, read back with an
    * explicit schema (reference read_csv/write_csv, context.py:1831,
    * dataframe.py:1482). */
  def scanCsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("nation_csv")
    t(s, d, "nation").coalesce(1).write.mode("overwrite")
      .option("header", "true").option("delimiter", "|").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema)
      .option("header", "true").option("delimiter", "|").csv(dir)
      .orderBy("n_nationkey")
  }
  val scanCsvRoundtripSql: String =
    "SELECT * FROM nation ORDER BY n_nationkey"

  /** NDJSON round-trip (reference read_json/write_json, context.py:1787). */
  def scanJsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("region_json")
    t(s, d, "region").coalesce(1).write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    s.read.schema(schema).json(dir).orderBy("r_regionkey")
  }
  val scanJsonRoundtripSql: String =
    "SELECT * FROM region ORDER BY r_regionkey"

  /** Arrow IPC round-trip (reference `__arrow_c_stream__` export,
    * dataframe.py:1780-1816, and `read_arrow`/`from_arrow` ingestion,
    * context.py:2025/839): export one Arrow IPC stream file per partition,
    * re-ingest the directory, and reduce — the oracle runs the same
    * reduction on the original parquet, so a pass proves the Arrow boundary
    * is lossless for long/timestamp/double/string columns. */
  def scanArrowRoundtrip(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graftarrow.ArrowBridge
    val dir = tmpDir("orders_arrow")
    val src = t(s, d, "orders").filter(col("o_orderkey") < 2000)
      .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    ArrowBridge.writeArrowFiles(src, dir, maxRecordsPerBatch = 500)
    ArrowBridge.readArrowFiles(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderkey")).as("last_key"))
      .orderBy("o_orderstatus")
  }
  val scanArrowRoundtripSql: String =
    s"""SELECT o_orderstatus, count(*) AS n, ${DSUM("o_totalprice")} AS total,
       |  min(o_orderdate)::TIMESTAMP AS first_date,
       |  max(o_orderkey) AS last_key
       |FROM orders WHERE o_orderkey < 2000
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Avro round-trip (reference read_avro, context.py:1994): write one
    * Avro container file per partition via the Avro Java core (see
    * graft.sources.AvroIO — the spark-avro connector jar is not packaged
    * here), re-ingest with header-inferred schema, reduce, and compare to
    * the oracle's reduction of the original parquet. Exercises long,
    * timestamp (micros logical type), double and string columns. */
  def scanAvroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("customer_avro")
    val src = t(s, d, "customer").filter(col("c_custkey") < 1500)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    graft.sources.AvroIO.writeAvro(src, dir)
    graft.sources.AvroIO.readAvro(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"),
        min(col("c_name")).as("first_name"), max(col("c_custkey")).as("last_key"))
      .orderBy("c_mktsegment")
  }
  val scanAvroRoundtripSql: String =
    s"""SELECT c_mktsegment, count(*) AS n, ${DSUM("c_acctbal")} AS total_bal,
       |  min(c_name) AS first_name, max(c_custkey) AS last_key
       |FROM customer WHERE c_custkey < 1500
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Hive-style partitioned write + partition-discovering read (reference
    * DataFrameWriteOptions partition_by, dataframe.py:1899; partitioned
    * scan context.py:1062). */
  def writePartitioned(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("orders_part")
    t(s, d, "orders").filter(col("o_orderkey") < 1000)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }
  val writePartitionedSql: String =
    s"""SELECT o_orderstatus, count(*) AS n, ${DSUM("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey < 1000
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Bucketed write + co-located join: both join sides are written
    * bucketed (and sorted) by the join key into the warehouse, so the
    * subsequent join is a zero-shuffle sort-merge — each task reads one
    * matching bucket pair. This is THE 100 TB topology for a fact table
    * that is joined on the same key repeatedly: the shuffle is paid once
    * at write time and amortized across every downstream join.
    * BucketedJoinSpec asserts the executed join plan contains no shuffle
    * exchange; the oracle checks the result equals a plain join. Eight
    * buckets here — at scale, size buckets so one bucket ≈ one task's
    * worth of rows. */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    bucketedOrdersJoin(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }
  /** The shuffle-free joined frame, pre-aggregation — shared with the
    * plan-asserting spec. */
  def bucketedOrdersJoin(s: SparkSession, d: String): DataFrame = {
    // Drop catalog entries AND locations: a table written by an earlier
    // session survives on disk but not in this session's in-memory
    // catalog, and saveAsTable refuses a pre-existing managed location.
    Seq("graft_orders_b", "graft_customer_b").foreach { tbl =>
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    t(s, d, "customer").select("c_custkey", "c_mktsegment")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_b")
    s.table("graft_orders_b")
      .join(s.table("graft_customer_b"),
        col("o_custkey") === col("c_custkey"))
  }
  val joinBucketedSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_orders,
       |  ${DSUM("o_totalprice")} AS total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Z-order clustered write: lineitem re-laid-out by the Morton
    * interleave of (l_partkey, l_suppkey) — range-shuffled on the z-key
    * and sorted within partitions, so every output file's min/max
    * envelope is tight on BOTH keys and a reader (or a table format's
    * file index) can skip most files for a predicate on EITHER
    * dimension. A lexicographic layout gives that only for its leading
    * key; the natural (orderkey) layout gives it for neither. The
    * registry result is a point-band aggregate over the re-read layout
    * (the oracle computes it on the original table — clustering must
    * never change query results); the skipping itself is measured in
    * ZOrderSpec via per-file stat envelopes. At 100 TB this is the
    * write-side half of data skipping: one range shuffle at ingest buys
    * stat-based pruning on every later scan. */
  def writeZorder(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("lineitem_zorder")
    val li = t(s, d, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
    val st = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect().head
    li.withColumn("z",
        graft.functions.ZOrder.zvalueScaled(
          col("l_partkey"), st.getLong(0), st.getLong(1),
          col("l_suppkey"), st.getLong(2), st.getLong(3), 16))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .filter(col("l_partkey").between(500, 699) &&
        col("l_suppkey").between(20, 39))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
        dsum(col("l_extendedprice")).as("revenue"))
  }
  val writeZorderSql: String =
    s"""SELECT count(*) AS n, ${DSUM("l_quantity")} AS qty,
       |  ${DSUM("l_extendedprice")} AS revenue
       |FROM lineitem
       |WHERE l_partkey BETWEEN 500 AND 699
       |  AND l_suppkey BETWEEN 20 AND 39""".stripMargin

  /** SQL DDL + DML: CREATE TABLE / INSERT OVERWRITE / SELECT (reference
    * DmlStatement + write_table, expr.py:95-187, dataframe.py:1659). */
  def sqlInsert(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    val loc = tmpDir("ins_table")
    s.sql("DROP TABLE IF EXISTS graft_ins")
    s.sql(s"CREATE TABLE graft_ins (k BIGINT, seg STRING) USING PARQUET LOCATION '$loc'")
    s.sql(
      """INSERT OVERWRITE graft_ins
        |SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 50""".stripMargin)
    s.sql("SELECT seg, count(*) AS n, min(k) AS first_k FROM graft_ins GROUP BY seg ORDER BY seg")
  }
  val sqlInsertSql: String =
    """SELECT c_mktsegment AS seg, count(*) AS n, min(c_custkey) AS first_k
      |FROM customer WHERE c_custkey < 50
      |GROUP BY seg ORDER BY seg""".stripMargin

  /** enable_url_table analog (reference context.py:584): query a file path
    * directly as a table — Spark's native ``format.`path` `` relation. */
  def sqlUrlTable(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT n_nationkey, n_name, count(*) AS n
         |FROM parquet.`$d/nation.parquet`
         |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin)
  val sqlUrlTableSql: String =
    """SELECT n_nationkey, n_name, count(*) AS n FROM nation
      |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin

  /** Unparser surface (reference unparser.py:18): build a DataFrame plan,
    * unparse it to SQL text, and execute THAT text — the oracle checks the
    * round-tripped SQL computes the original query's results. */
  def sqlUnparse(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    val df = s.table("customer")
      .filter(col("c_acctbal") > 0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
      .orderBy("c_mktsegment")
    s.sql(Unparser(df))
  }
  val sqlUnparseSql: String =
    s"""SELECT c_mktsegment, count(*) AS n, ${DSUM("c_acctbal")} AS total
       |FROM customer WHERE c_acctbal > 0
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Unparser DuckDB dialect (reference unparser.py:30-80, per-dialect
    * emitters): unparse the plan to DuckDB SQL. Spark executes the original
    * DataFrame while the ORACLE IS THE UNPARSED TEXT — the driver running
    * that text in DuckDB proves the emitted dialect end-to-end. The query
    * asserts the emitted text equals the oracle literal, so renderer drift
    * fails correctness loudly instead of silently diverging. */
  def sqlUnparseDuckdb(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    val df = s.table("customer")
      .filter(col("c_acctbal") > 100.0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
      .orderBy("c_mktsegment")
    val text = Unparser(df, Unparser.DuckDb)
    require(text == sqlUnparseDuckdbSql,
      s"DuckDB unparse drifted from the oracle literal:\n$text")
    df
  }
  val sqlUnparseDuckdbSql: String =
    """SELECT * FROM (SELECT "c_mktsegment", count(*) AS "n", """ +
      """CAST(sum(CAST("c_acctbal" AS DECIMAL(30,6))) AS DOUBLE) AS "total" """ +
      """FROM (SELECT * FROM "customer" WHERE ("c_acctbal" > 100.0)) AS __u0 """ +
      """GROUP BY "c_mktsegment") AS __u1 """ +
      """ORDER BY "c_mktsegment" ASC NULLS FIRST"""

  /** Unparser PostgreSQL dialect (reference unparser.py:44-46). Like the
    * DuckDB entry, the ORACLE IS THE EMITTED TEXT: Postgres's double-quoted
    * identifiers, correlated-EXISTS semi join, and explicit NULLS ordering
    * all sit inside DuckDB's accepted grammar, so the driver executing the
    * text in DuckDB proves the dialect end-to-end; the query asserts the
    * text equals the oracle literal so renderer drift fails loudly. */
  def sqlUnparsePostgres(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    val df = s.table("customer")
      .join(s.table("orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .filter(col("c_acctbal") > 1000.0)
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
    val text = Unparser(df, Unparser.Postgres)
    require(text == sqlUnparsePostgresSql,
      s"Postgres unparse drifted from the oracle literal:\n$text")
    df
  }
  val sqlUnparsePostgresSql: String =
    """SELECT * FROM (SELECT "c_custkey", "c_mktsegment" FROM """ +
      """(SELECT * FROM (SELECT * FROM "customer" AS __u0 WHERE EXISTS """ +
      """(SELECT 1 FROM "orders" AS __u1 WHERE ("__u0"."c_custkey" = "__u1"."o_custkey"))) AS __u2 """ +
      """WHERE ("c_acctbal" > 1000.0)) AS __u3) AS __u4 """ +
      """ORDER BY "c_custkey" ASC NULLS FIRST"""

  /** Unparser MySQL dialect (reference unparser.py:40-42): backtick
    * quoting, `<=>` null-safe equality, CAST-to-CHAR, the `(expr IS NULL)`
    * prefix key emulating the missing NULLS clause, and the documented
    * all-rows `LIMIT 18446744073709551615 OFFSET n` idiom. MySQL text is
    * not DuckDB-parseable, so Spark executes the original frame against an
    * equivalent DuckDB oracle while the emitted text is pinned by the
    * equality assert. */
  def sqlUnparseMysql(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    val df = s.table("nation")
      .filter(col("n_regionkey") <=> 1L)
      .select(col("n_nationkey"), col("n_name"),
        col("n_nationkey").cast("string").as("nk_str"))
      .orderBy(col("n_name").asc_nulls_last)
      .offset(3)
    val text = Unparser(df, Unparser.MySql)
    require(text == sqlUnparseMysqlText,
      s"MySQL unparse drifted from the pinned text:\n$text")
    df
  }
  val sqlUnparseMysqlText: String =
    "SELECT * FROM (SELECT * FROM (SELECT `n_nationkey`, `n_name`, " +
      "CAST(`n_nationkey` AS CHAR) AS `nk_str` FROM " +
      "(SELECT * FROM `nation` WHERE (CAST(`n_regionkey` AS SIGNED) <=> 1)) AS __u0) AS __u1 " +
      "ORDER BY (`n_name` IS NULL) ASC, `n_name` ASC) AS __u2 " +
      "LIMIT 18446744073709551615 OFFSET 3"
  val sqlUnparseMysqlSql: String =
    """SELECT n_nationkey, n_name, CAST(n_nationkey AS VARCHAR) AS nk_str
      |FROM nation WHERE n_regionkey IS NOT DISTINCT FROM 1
      |ORDER BY n_name ASC NULLS LAST OFFSET 3""".stripMargin

  /** Unparser SQLite dialect (reference unparser.py:48-50): double-quote
    * quoting, `IS` as null-safe equality, storage-class CAST targets
    * (REAL/INTEGER/TEXT), and the `LIMIT -1 OFFSET n` all-rows idiom.
    * Same pinned-text + equivalent-DuckDB-oracle contract as MySQL. */
  def sqlUnparseSqlite(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    val df = s.table("nation")
      .filter(col("n_regionkey") <=> 2L)
      .select(col("n_name"), col("n_nationkey").cast("double").as("nk_real"))
      .orderBy("n_name")
      .offset(2)
    val text = Unparser(df, Unparser.Sqlite)
    require(text == sqlUnparseSqliteText,
      s"SQLite unparse drifted from the pinned text:\n$text")
    df
  }
  val sqlUnparseSqliteText: String =
    """SELECT * FROM (SELECT * FROM (SELECT "n_name", """ +
      """CAST("n_nationkey" AS REAL) AS "nk_real" FROM """ +
      """(SELECT * FROM "nation" WHERE (CAST("n_regionkey" AS INTEGER) IS 2)) AS __u0) AS __u1 """ +
      """ORDER BY "n_name" ASC NULLS FIRST) AS __u2 LIMIT -1 OFFSET 2"""
  val sqlUnparseSqliteSql: String =
    """SELECT n_name, CAST(n_nationkey AS DOUBLE) AS nk_real
      |FROM nation WHERE n_regionkey IS NOT DISTINCT FROM 2
      |ORDER BY n_name OFFSET 2""".stripMargin

  /** Sketch aggregates (reference approx_distinct functions/__init__.py:4926,
    * approx_median :4966, approx_percentile_cont :5001). Rows-only: HLL and
    * KLL sketches are engine-specific; exactness is asserted in ExtrasSpec
    * against exact counterparts. */
  def aggApprox(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"),
        median(col("l_extendedprice")).as("exact_median"))
      // sketch outputs are engine-specific, so the oracle-checkable shape
      // emits the EXACT aggregate plus a per-group tolerance boolean the
      // oracle pins to `true`: HLL at rsd 2% within 10% of the exact
      // distinct count (a 5-sigma margin, so the boolean stays true on any
      // regenerated corpus, not just this one), the 10k-bucket KLL median
      // within 5% of the exact median. A sketch regression flips the
      // boolean and fails the hash gate; the exact columns keep the
      // values bit-checked.
      .select(col("l_returnflag"),
        col("exact_orders"),
        round(col("exact_median"), 4).as("exact_median"),
        (abs(col("approx_orders") - col("exact_orders")).cast("double") /
          col("exact_orders") < 0.1).as("orders_within_tol"),
        (abs(col("approx_median") - col("exact_median")) /
          col("exact_median") < 0.05).as("median_within_tol"))
      .orderBy("l_returnflag")
  val aggApproxSql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  round(CAST(median(l_extendedprice) AS DOUBLE), 4) AS exact_median,
      |  true AS orders_within_tol,
      |  true AS median_within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** describe()/summary() (reference dataframe.py:417). The operator under
    * test is Spark's `.describe()`; its raw output is a STRING matrix whose
    * mean/stddev cells are shortest-roundtrip double reprs — order-dependent
    * in the last ulp under distributed aggregation, so un-comparable across
    * engines bit-for-bit. For the oracle compare the string matrix is cast
    * back to doubles rounded to 4 decimals (engine-independent; the raw
    * 5-row string shape keeps its own spec in KernelsSpec). */
  def rowopDescribe(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select("p_size", "p_retailprice").describe()
      .select(col("summary"),
        round(col("p_size").cast("double"), 4).as("p_size"),
        round(col("p_retailprice").cast("double"), 4).as("p_retailprice"))
  val rowopDescribeSql: String =
    """SELECT 'count' AS summary, round(CAST(count(p_size) AS DOUBLE), 4) AS p_size,
      |  round(CAST(count(p_retailprice) AS DOUBLE), 4) AS p_retailprice FROM part
      |UNION ALL SELECT 'mean', round(avg(p_size), 4), round(avg(p_retailprice), 4) FROM part
      |UNION ALL SELECT 'stddev', round(stddev_samp(p_size), 4), round(stddev_samp(p_retailprice), 4) FROM part
      |UNION ALL SELECT 'min', round(CAST(min(p_size) AS DOUBLE), 4), round(CAST(min(p_retailprice) AS DOUBLE), 4) FROM part
      |UNION ALL SELECT 'max', round(CAST(max(p_size) AS DOUBLE), 4), round(CAST(max(p_retailprice) AS DOUBLE), 4) FROM part""".stripMargin

  /** Native codegen'd vector kernels vs the DuckDB list functions
    * (cosine/inner-product/L2/L1 — reference functions/__init__.py:3584,
    * 3638, 4535). Every embedding scored against the vec_id=0 probe. */
  def fnVector(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions._
    val vecs = t(s, d, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val probe = vecs.filter(col("vec_id") === 0)
      .select(col("v").as("pv"))
    vecs.filter(col("vec_id") < 50).join(broadcast(probe))
      .select(
        col("vec_id"),
        round(cosine_sim(col("v"), col("pv")), 6).as("cos_sim"),
        round(lit(1.0) - cosine_sim(col("v"), col("pv")), 6).as("cos_dist"),
        round(inner_product(col("v"), col("pv")), 4).as("dot"),
        round(l2_distance(col("v"), col("pv")), 6).as("l2"),
        round(aggregate(zip_with(col("v"), col("pv"), (x, y) => abs(x - y)),
          lit(0.0), (acc, x) => acc + x), 6).as("l1"))
      .orderBy("vec_id")
  }
  val fnVectorSql: String =
    """WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |probe AS (SELECT v AS pv FROM vecs WHERE vec_id = 0)
      |SELECT vec_id,
      |  round(list_cosine_similarity(v, pv), 6) AS cos_sim,
      |  round(1.0 - list_cosine_similarity(v, pv), 6) AS cos_dist,
      |  round(list_dot_product(v, pv), 4) AS dot,
      |  round(list_distance(v, pv), 6) AS l2,
      |  round(CAST(list_sum(list_transform(generate_series(1, len(v)),
      |    i -> abs(v[i] - pv[i]))) AS DOUBLE), 6) AS l1
      |FROM vecs, probe WHERE vec_id < 50 ORDER BY vec_id""".stripMargin

  /** arrow_typeof analog (reference functions/__init__.py arrow_typeof):
    * the Arrow type name of each column of a mixed-type projection,
    * derived from the analyzed schema via TypeBridge — pins the
    * Spark↔Arrow name mapping against a literal oracle. */
  def fnArrowTypeof(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probe = t(s, d, "orders").selectExpr(
      "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "cast(o_orderkey as int) AS key32",
      "cast(o_totalprice as decimal(12,2)) AS price_dec",
      "o_totalprice > 1000.0 AS big",
      "array(o_orderkey) AS keys",
      "cast(o_orderstatus as binary) AS status_bin")
    probe.schema.fields.toSeq
      .map(f => (f.name, TypeBridge.arrowTypeName(f.dataType)))
      .toDF("col_name", "arrow_type")
      .orderBy("col_name")
  }
  val fnArrowTypeofSql: String =
    """SELECT * FROM (VALUES
      |  ('o_orderkey', 'Int64'),
      |  ('o_orderstatus', 'Utf8'),
      |  ('o_totalprice', 'Float64'),
      |  ('o_orderdate', 'Timestamp(Microsecond, None)'),
      |  ('key32', 'Int32'),
      |  ('price_dec', 'Decimal128(12, 2)'),
      |  ('big', 'Boolean'),
      |  ('keys', 'List(Int64)'),
      |  ('status_bin', 'Binary')) t(col_name, arrow_type)
      |ORDER BY col_name""".stripMargin

  /** Column-metadata plumbing (reference with_metadata/arrow_metadata/
    * arrow_field, functions/__init__.py:3150-3256, and
    * literal_with_metadata, __init__.py:191 / expr.py:844 — see
    * graft.functions.ColumnMeta): attach field metadata (merge + overwrite
    * semantics), round-trip it through a parquet write/read (Spark carries
    * it in the footer's schema), then read it back out three ways — the
    * field-pair enumeration, the single-key lookup column, and the
    * arrow_field struct — against a literal oracle. */
  def fnMetadata(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.ColumnMeta
    val dir = tmpDir("meta_parquet")
    val base = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
    // merge path: second call preserves "entity" and overwrites "lang"
    val tagged = ColumnMeta.withMetadata(
      ColumnMeta.withMetadata(base, "n_name",
        Map("entity" -> "nation", "lang" -> "en")),
      "n_name", Map("lang" -> "en_US"))
      .withColumn("src",
        ColumnMeta.litWithMetadata("tpch", "src", Map("kind" -> "constant")))
    tagged.write.mode("overwrite").parquet(dir)
    val back = s.read.parquet(dir)
    val fieldRows = back.schema.fields.toSeq.flatMap { f =>
      Seq((s"${f.name}.type", TypeBridge.arrowTypeName(f.dataType))) ++
        ColumnMeta.metadataPairs(f).map { case (k, v) => (s"${f.name}.meta.$k", v) }
    }.toDF("item", "value")
    val lookup = back.limit(1).select(
      lit("lookup.n_name.lang").as("item"),
      ColumnMeta.arrowMetadata(back, "n_name", "lang").as("value"))
    val missing = back.limit(1).select(
      lit("lookup.n_name.absent").as("item"),
      coalesce(ColumnMeta.arrowMetadata(back, "n_name", "absent"),
        lit("<null>")).as("value"))
    val field = back.limit(1).select(
      lit("field.n_name").as("item"),
      to_json(ColumnMeta.arrowField(back, "n_name")).as("value"))
    fieldRows.union(lookup).union(missing).union(field).orderBy("item")
  }
  val fnMetadataSql: String =
    """SELECT * FROM (VALUES
      |  ('field.n_name', '{"name":"n_name","data_type":"Utf8","nullable":true,"metadata":{"entity":"nation","lang":"en_US"}}'),
      |  ('lookup.n_name.absent', '<null>'),
      |  ('lookup.n_name.lang', 'en_US'),
      |  ('n_name.meta.entity', 'nation'),
      |  ('n_name.meta.lang', 'en_US'),
      |  ('n_name.type', 'Utf8'),
      |  ('n_nationkey.type', 'Int32'),
      |  ('src.meta.kind', 'constant'),
      |  ('src.type', 'Utf8')) t(item, value)
      |ORDER BY item""".stripMargin

  /** register_record_batches analog (reference context.py:1002-1060):
    * an in-memory table from explicit row batches, one batch per
    * partition — the partition structure survives into the plan. */
  def memBatches(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("sq", LongType, nullable = false)))
    val batches = (0 until 3).map(b =>
      (b * 10 until (b + 1) * 10).map(i => Row(i.toLong, (i * i).toLong)))
    Q.fromBatches(s, batches, schema).orderBy("k")
  }
  val memBatchesSql: String =
    """SELECT CAST(i AS BIGINT) AS k, CAST(i * i AS BIGINT) AS sq
      |FROM generate_series(0, 29) t(i) ORDER BY k""".stripMargin

  /** UDTF surface (reference udtf/TableFunction, user_defined.py:1124-1250):
    * a table function `(args) → DataFrame`, SQL-callable after view
    * registration — the Scala-API shape of a user-defined table function. */
  def seriesTable(s: SparkSession, start: Long, stop: Long, step: Long): DataFrame =
    s.range(start, stop, step)
      .select(col("id"), (col("id") * col("id")).as("squared"))

  def udtfSeries(s: SparkSession, d: String): DataFrame = {
    seriesTable(s, 0, 100, 7).createOrReplaceTempView("graft_series")
    s.sql("SELECT id, squared FROM graft_series ORDER BY id")
  }
  val udtfSeriesSql: String =
    """SELECT CAST(i AS BIGINT) AS id, CAST(i * i AS BIGINT) AS squared
      |FROM generate_series(0, 99, 7) t(i) ORDER BY id""".stripMargin

  /** Typed scaled-long-sum Aggregator: order-independent exact UDAF. */
  object ScaledSum extends Aggregator[Double, Long, Double] {
    override def zero: Long = 0L
    override def reduce(acc: Long, x: Double): Long = acc + math.round(x * 100)
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(acc: Long): Double = acc / 100.0
    override def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** UDF + UDAF surface (reference udf/udaf, user_defined.py:128-706):
    * a deterministic scalar UDF and a typed Aggregator whose buffer is a
    * scaled long (update/merge = the reference Accumulator contract),
    * both SQL-registered and oracle-checkable. */
  def udfSurface(s: SparkSession, d: String): DataFrame = {
    val score = udf((bal: Double, seg: String) =>
      if (seg == "BUILDING") bal * 2 else bal)
    s.udf.register("graft_scaled_sum", udaf(ScaledSum))
    t(s, d, "customer")
      .withColumn("score", score(col("c_acctbal"), col("c_mktsegment")))
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("graft_scaled_sum(score)").as("sum_score"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }
  val udfSurfaceSql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(round((CASE WHEN c_mktsegment = 'BUILDING'
      |    THEN c_acctbal * 2 ELSE c_acctbal END) * 100) AS BIGINT)) AS DOUBLE)
      |    / 100.0 AS sum_score,
      |  count(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** DSv2 connector (graft.sources.GenTableProvider) driven through the
    * correctness gate: filters/projection push into the custom scan; the
    * oracle reproduces the deterministic generator with a series table. */
  def dsv2Pushdown(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.GenTableProvider")
      .option("rows", "10000").load()
      .filter(col("id") >= 2000 && col("id") < 8000 && col("grp") < 10)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), dsum(col("val")).as("total_val"))
      .orderBy("grp")
  val dsv2PushdownSql: String =
    s"""SELECT CAST(i % 50 AS INT) AS grp, count(*) AS n,
       |  ${DSUM("(i * 31 % 997) / 10.0")} AS total_val
       |FROM generate_series(0, 9999) t(i)
       |WHERE i >= 2000 AND i < 8000 AND i % 50 < 10
       |GROUP BY grp ORDER BY grp""".stripMargin

  /** information_schema.tables (reference `with_information_schema`,
    * context.py:193-203 — DataFusion's built-in information_schema
    * provider): registered relations are visible to plain SQL. The oracle
    * is the literal expected catalog rows. */
  def infoSchemaTables(s: SparkSession, d: String): DataFrame = {
    graft.sources.InfoSchema.enable(s)
    s.read.parquet(s"$d/nation.parquet").createOrReplaceTempView("is_nation")
    s.read.parquet(s"$d/region.parquet").createOrReplaceTempView("is_region")
    s.sql(
      """SELECT table_catalog, table_schema, table_name, table_type
        |FROM information_schema.tables
        |WHERE table_name IN ('is_nation', 'is_region')
        |ORDER BY table_name""".stripMargin)
  }
  val infoSchemaTablesSql: String =
    """SELECT * FROM (VALUES
      |  ('spark_catalog', 'session', 'is_nation', 'VIEW'),
      |  ('spark_catalog', 'session', 'is_region', 'VIEW'))
      |AS t(table_catalog, table_schema, table_name, table_type)
      |ORDER BY table_name""".stripMargin

  /** information_schema.columns: per-column catalog metadata
    * (1-based ordinal_position, SQL-standard YES/NO nullability). */
  def infoSchemaColumns(s: SparkSession, d: String): DataFrame = {
    graft.sources.InfoSchema.enable(s)
    s.read.parquet(s"$d/nation.parquet").createOrReplaceTempView("is_nation")
    s.read.parquet(s"$d/region.parquet").createOrReplaceTempView("is_region")
    s.sql(
      """SELECT table_name, column_name, ordinal_position, data_type, is_nullable
        |FROM information_schema.columns
        |WHERE table_name IN ('is_nation', 'is_region')
        |ORDER BY table_name, ordinal_position""".stripMargin)
  }
  val infoSchemaColumnsSql: String =
    """SELECT * FROM (VALUES
      |  ('is_nation', 'n_nationkey', 1, 'INT', 'YES'),
      |  ('is_nation', 'n_name', 2, 'STRING', 'YES'),
      |  ('is_nation', 'n_regionkey', 3, 'INT', 'YES'),
      |  ('is_region', 'r_regionkey', 1, 'INT', 'YES'),
      |  ('is_region', 'r_name', 2, 'STRING', 'YES'))
      |AS t(table_name, column_name, ordinal_position, data_type, is_nullable)
      |ORDER BY table_name, ordinal_position""".stripMargin

  /** Row types for the typed cogroup demo (top-level in the object so
    * product encoders derive statically). */
  case class CustRow(c_custkey: Long, c_mktsegment: String)
  case class OrdRow(o_custkey: Long, o_totalprice: Double)

  /** Typed Dataset cogroup (`KeyValueGroupedDataset.cogroup`): per
    * customer, merge the customer row with its order group in one typed
    * merge function — the Dataset[T]/Encoder surface for per-key
    * imperative logic Spark can't express relationally. Both sides
    * shuffle-partition by the key and stream one pass per group (the
    * sort-merge-join topology, so it scales like a join). The monetary
    * total accumulates in exact BigDecimal (order-independent, matching
    * the oracle's decimal-sum lane) — never a raw double fold. */
  def typedCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val custs = t(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).as[CustRow]
    val ords = t(s, d, "orders")
      .select(col("o_custkey"), col("o_totalprice")).as[OrdRow]
    custs.groupByKey(_.c_custkey)
      .cogroup(ords.groupByKey(_.o_custkey)) { (key, cs, os) =>
        cs.toSeq.headOption.iterator.map { c =>
          var n = 0L
          var total = BigDecimal(0)
          os.foreach { o =>
            n += 1
            total += BigDecimal(o.o_totalprice)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          }
          (key, c.c_mktsegment, n, total.toDouble)
        }
      }
      .toDF("custkey", "segment", "n_orders", "total")
      .orderBy("custkey")
  }
  val typedCogroupSql: String =
    s"""SELECT c_custkey AS custkey, c_mktsegment AS segment,
       |  count(o_orderkey) AS n_orders,
       |  coalesce(${DSUM("o_totalprice")}, 0.0) AS total
       |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       |GROUP BY c_custkey, c_mktsegment ORDER BY custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_cogroup" -> (typedCogroup _),
    "dsv2_pushdown" -> (dsv2Pushdown _),
    "info_schema_tables" -> (infoSchemaTables _),
    "info_schema_columns" -> (infoSchemaColumns _),
    "scan_csv_roundtrip" -> (scanCsvRoundtrip _),
    "scan_json_roundtrip" -> (scanJsonRoundtrip _),
    "scan_arrow_roundtrip" -> (scanArrowRoundtrip _),
    "scan_avro_roundtrip" -> (scanAvroRoundtrip _),
    "write_partitioned" -> (writePartitioned _),
    "join_bucketed" -> (joinBucketed _),
    "write_zorder" -> (writeZorder _),
    "sql_insert" -> (sqlInsert _),
    "sql_url_table" -> (sqlUrlTable _),
    "sql_unparse" -> (sqlUnparse _),
    "sql_unparse_duckdb" -> (sqlUnparseDuckdb _),
    "sql_unparse_postgres" -> (sqlUnparsePostgres _),
    "sql_unparse_mysql" -> (sqlUnparseMysql _),
    "sql_unparse_sqlite" -> (sqlUnparseSqlite _),
    "agg_approx" -> (aggApprox _),
    "rowop_describe" -> (rowopDescribe _),
    "fn_vector" -> (fnVector _),
    "fn_arrow_typeof" -> (fnArrowTypeof _),
    "fn_metadata" -> (fnMetadata _),
    "mem_batches" -> (memBatches _),
    "udf_surface" -> (udfSurface _),
    "udtf_series" -> (udtfSeries _))

  val oracle: Map[String, String] = Map(
    "dsv2_pushdown" -> dsv2PushdownSql,
    "info_schema_tables" -> infoSchemaTablesSql,
    "info_schema_columns" -> infoSchemaColumnsSql,
    "scan_csv_roundtrip" -> scanCsvRoundtripSql,
    "scan_json_roundtrip" -> scanJsonRoundtripSql,
    "scan_arrow_roundtrip" -> scanArrowRoundtripSql,
    "scan_avro_roundtrip" -> scanAvroRoundtripSql,
    "write_partitioned" -> writePartitionedSql,
    "join_bucketed" -> joinBucketedSql,
    "write_zorder" -> writeZorderSql,
    "sql_insert" -> sqlInsertSql,
    "sql_url_table" -> sqlUrlTableSql,
    "sql_unparse" -> sqlUnparseSql,
    "sql_unparse_duckdb" -> sqlUnparseDuckdbSql,
    "sql_unparse_postgres" -> sqlUnparsePostgresSql,
    "sql_unparse_mysql" -> sqlUnparseMysqlSql,
    "sql_unparse_sqlite" -> sqlUnparseSqliteSql,
    "agg_approx" -> aggApproxSql,
    "rowop_describe" -> rowopDescribeSql,
    "fn_vector" -> fnVectorSql,
    "fn_arrow_typeof" -> fnArrowTypeofSql,
    "fn_metadata" -> fnMetadataSql,
    "mem_batches" -> memBatchesSql,
    "typed_cogroup" -> typedCogroupSql,
    "udf_surface" -> udfSurfaceSql,
    "udtf_series" -> udtfSeriesSql)
}
