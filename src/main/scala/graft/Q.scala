package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for building oracle-matched queries.
  *
  * Double aggregation is order-dependent; a 100 TB shuffle will not sum
  * doubles in the same order as DuckDB's single-threaded oracle. Every sum
  * over a double measure is therefore routed through an exact decimal
  * (cast per-row, summed as decimal, surfaced as double) so the result is
  * deterministic and engine-independent at any parallelism.
  */
object Q {
  /** Read one driver-generated table (TESTDATA.md) from an sf dir.
    * If [[cacheTables]] has registered this dir, serve the cached
    * in-memory view instead (same rows, repartitioned for parallelism). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (spark.conf.getOption("graft.cached.dir").contains(dir))
      spark.table(name)
    else read(spark, dir, name)

  /** Per-document distinct adjacent-word edges with multiplicities
    * (src, dst, pc) from a frame holding a `ws` array<string> column —
    * the shared head of the co-occurrence graph family (round 15): the
    * (src, dst) reduce happens inside [[graft.functions.BigramEdgeCounts]]
    * per document, so downstream edge-weight shuffles ship per-doc
    * DISTINCT edges (`sum(pc)` replays the exploded `count(*)`), and the
    * single-word null-edge rows of the HOF it replaces are preserved
    * bit for bit. */
  def bigramEdges(docs: DataFrame): DataFrame =
    docs.select(explode(
        org.apache.spark.sql.graftcol.NativeColumn.column(
          graft.functions.BigramEdgeCounts(
            org.apache.spark.sql.graftcol.NativeColumn.expression(col("ws")))))
        .as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"),
        col("p.c").as("pc"))

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some corpus
    * generations (Spark's reader rejects it unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as a
    * nanosecond LONG) and as TIMESTAMP(MICROS) in others (arriving as
    * TIMESTAMP or TIMESTAMP_NTZ). Normalize every encoding to a session-TZ
    * microsecond TimestampType so downstream operators see one shape;
    * both conversions are lossless (the generator only uses µs). */
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeEventsTs(eventsRaw(spark, dir))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Raw events frame exactly as encoded on disk (a nanos corpus needs the
    * legacy conf so the NANOS column surfaces as LONG instead of failing
    * the read). The streaming specs take their `readStream` schema from
    * this and then pipe through [[normalizeEventsTs]], so one code path
    * serves every corpus generation. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Normalize any shipped `ts` encoding — LONG nanoseconds, TIMESTAMP, or
    * TIMESTAMP_NTZ — to a session-TZ microsecond TimestampType, batch or
    * streaming. All conversions are lossless (the generator only emits µs). */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // integer division: ts/1000 in double loses µs precision at 2024
        // epoch magnitudes (ulp > 0.25µs)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => // TIMESTAMP_NTZ: session TZ is UTC, cast is the identity
        df.withColumn("ts", col("ts").cast("timestamp"))
    }

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Fixed-cardinality dims that stay single-partition (broadcast side). */
  private val smallTables = Set("region", "nation", "supplier")

  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => read(spark, dir, n).createOrReplaceTempView(n))

  /** Materialize every table into Spark's in-memory columnar cache,
    * repartitioned so downstream stages parallelize (the driver's parquet
    * files are single-row-group → a cold scan is a 1-task stage no matter
    * the cluster size; a real 100 TB layout has many splittable files and
    * would not need this). Mirrors the reference's MemTable registration
    * (`/root/reference/python/datafusion/context.py:783-887`) and
    * `DataFrame.cache()` (`dataframe.py:975`). */
  def cacheTables(spark: SparkSession, dir: String, partitions: Int): Unit = {
    tableNames.foreach { n =>
      val df = read(spark, dir, n)
      val p = if (smallTables(n)) df else df.repartition(partitions)
      p.createOrReplaceTempView(n)
      spark.catalog.cacheTable(n)
      spark.table(n).count() // force materialization
    }
    spark.conf.set("graft.cached.dir", dir)
  }

  /** In-memory table from explicit row batches, one batch per partition
    * (reference register_record_batches, context.py:1002-1060): the
    * partition structure is preserved — `parallelize` with one slice per
    * batch keeps each batch intact as its own partition. */
  def fromBatches(spark: SparkSession,
      batches: Seq[Seq[org.apache.spark.sql.Row]],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val rdd = spark.sparkContext
      .parallelize(batches, math.max(batches.length, 1))
      .flatMap(identity)
    spark.createDataFrame(rdd, schema)
  }

  /** Timestamp literal (all date columns in the corpus are timestamps). */
  def ts(s: String): Column = to_timestamp(lit(s))

  /** A/B escape hatch for [[ddec]] (measurement only): `off` routes the
    * quantization through the engine's `Cast`, so the two per-row paths
    * can be timed under the exact grading protocol in back-to-back legs.
    * Both paths are value-identical (FastDoubleToDecimal's property
    * pins), so the toggle can never change a result, only per-row cost. */
  private val ddecFast: Boolean =
    !sys.env.get("SPARK_GRAFT_DDEC_FAST").contains("off")

  /** Per-row double→decimal quantization under every exact-sum aggregate:
    * bit-identical to `c.cast(DecimalType(precision, scale))` (non-ANSI)
    * but ~30× cheaper per row — the r19 fixed-point fast path
    * ([[graft.functions.FastDoubleToDecimal]]) instead of the engine
    * cast's `Double.toString` + BigDecimal parse. The child must already
    * be a double (every corpus measure is). */
  def ddec(c: Column, precision: Int = 30, scale: Int = 6): Column =
    if (ddecFast)
      org.apache.spark.sql.graftcol.NativeColumn.column(
        graft.functions.FastDoubleToDecimal(
          org.apache.spark.sql.graftcol.NativeColumn.expression(c),
          precision, scale))
    else c.cast(DecimalType(precision, scale))

  /** Exact, order-independent sum of a double measure, surfaced as double.
    * Scale 6 because every corpus measure is a product of ≤3 two-decimal
    * values — the cast then never rounds, so Spark and the DuckDB oracle
    * agree bit-for-bit regardless of aggregation order. */
  def dsum(c: Column): Column = sum(ddec(c)).cast(DoubleType)

  /** Exact average of a double measure (decimal sum / count), as double. */
  def davg(c: Column): Column =
    sum(ddec(c)).cast(DoubleType) / count(c)

  /** Skew-safe equi-join: the big (skewed) side spreads each key over
    * `salts` deterministic sub-keys derived from full row content; the
    * small side replicates ×salts. Standard hot-key mitigation when AQE
    * skew handling isn't enough at 100 TB — result is identical to the
    * plain join, but no reducer receives a whole hot key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val l = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong))
        .cast("int"))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Range-partition width for the exact-rank topology: follows the
    * session's shuffle parallelism so the same code is the plan at any
    * scale (a fixed literal would cap the sort's parallelism at 100×).
    * The emitted positions are exact, hence partition-count independent. */
  private[graft] def rangeParts(df: DataFrame): Int = math.max(1,
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Distributed exact ntile: SQL-identical buckets to
    * `ntile(buckets) OVER (ORDER BY order...)` with no single-partition
    * global sort. Topology: range repartition on the order key → per-
    * partition rank (parallel window keyed by the physical partition id) →
    * partition-size offsets cumsum'd on the driver (a partition-count-sized
    * collect — the same bookkeeping `RDD.zipWithIndex` does) broadcast back.
    * Bucket from the 0-based global position by the standard ntile split
    * (first n%B buckets take one extra row), so the result is bit-identical
    * to the engine builtin while every heavy stage stays parallel. The
    * order must be a total order (add a key tie-break) for reproducibility. */
  def distNtile(df: DataFrame, buckets: Int, out: String, order: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .repartitionByRange(rangeParts(df), order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // consumed twice (size census + rank join): pin partition contents
      .localCheckpoint()
    val sizes = keyed.groupBy("__pid").agg(count(lit(1)).as("pn")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = sizes.map(_._2).sum
    val q = n / buckets
    val r = n % buckets
    val offsets = sizes.map(_._1).zip(sizes.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(order: _*)
    val bin =
      if (q == 0L) s"__pos + 1"
      else s"CASE WHEN __pos < ${r * (q + 1)} THEN __pos div ${q + 1} + 1 " +
        s"ELSE (__pos - ${r * (q + 1)}) div $q + $r + 1 END"
    keyed.join(offDf, "__pid")
      .withColumn("__pos", col("__off") + row_number().over(w) - 1)
      .withColumn(out, expr(bin).cast("long"))
      .drop("__pid", "__off", "__pos")
  }

  /** Distributed exact global position: SQL-identical to
    * `row_number() OVER (ORDER BY order...) - 1` with no single-partition
    * sort — the same range-shuffle → parallel per-partition rank →
    * broadcast partition-offset topology as [[distNtile]], emitting the
    * 0-based position itself. The order must be a total order. */
  def distPos(df: DataFrame, out: String, order: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .repartitionByRange(rangeParts(df), order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // consumed twice (size census + rank join): pin partition contents
      .localCheckpoint()
    val sizes = keyed.groupBy("__pid").agg(count(lit(1)).as("pn")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sizes.map(_._1).zip(sizes.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(order: _*)
    keyed.join(offDf, "__pid")
      .withColumn(out, col("__off") + row_number().over(w) - 1)
      .drop("__pid", "__off")
  }

  // --- DuckDB oracle SQL fragments mirroring the helpers above ---
  def DSUM(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def DAVG(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE) / count($e)"
}
