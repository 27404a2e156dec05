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

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's reader rejects;
    * with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a
    * nanosecond LONG and is converted here to a microsecond timestamp
    * (the generator only uses µs precision, so this is lossless). */
  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer division: ts/1000 in double loses µs precision at 2024
      // epoch magnitudes (ulp > 0.25µs)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
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

  /** Exact, order-independent sum of a double measure, surfaced as double.
    * Scale 6 because every corpus measure is a product of ≤3 two-decimal
    * values — the cast then never rounds, so Spark and the DuckDB oracle
    * agree bit-for-bit regardless of aggregation order. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Exact average of a double measure (decimal sum / count), as double. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast(DoubleType) / count(c)

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

  // --- DuckDB oracle SQL fragments mirroring the helpers above ---
  def DSUM(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def DAVG(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE) / count($e)"
}
