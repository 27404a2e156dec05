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
  /** Read one driver-generated table (TESTDATA.md) from an sf dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

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

  // --- DuckDB oracle SQL fragments mirroring the helpers above ---
  def DSUM(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def DAVG(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE) / count($e)"
}
