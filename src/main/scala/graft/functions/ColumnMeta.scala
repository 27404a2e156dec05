package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, map}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StringType, StructField}

/** Column-metadata plumbing — the Spark-native analog of the reference's
  * Arrow field-metadata surface:
  *
  *   - `with_metadata(expr, {k: v})` — reference
  *     `python/datafusion/functions/__init__.py:3256` — attach key/value
  *     pairs to a column's field, preserving existing metadata, new keys
  *     overwriting on collision, empty dict a no-op, empty keys rejected.
  *   - `arrow_metadata(expr[, key])` — `functions/__init__.py:3222` — all
  *     pairs as a map, or the value for one key.
  *   - `arrow_field(expr)` — `functions/__init__.py:3150` — a struct of
  *     (name, data_type, nullable, metadata).
  *   - `literal_with_metadata(value, {k: v})` —
  *     `python/datafusion/__init__.py:191`, `expr.py:844`.
  *
  * Spark carries field metadata natively on `StructField.metadata`,
  * attached through `Column.as(name, Metadata)` (SURVEY §2.9 mapping), and
  * round-trips it through parquet via the Spark schema recorded in the
  * footer — so these are thin facades over the built-in plumbing, not a
  * custom expression. One semantic note: in DataFusion `arrow_metadata` /
  * `arrow_field` are expressions resolved against the input field's
  * metadata at PLAN time (field metadata is constant per column); the
  * Spark analogs do the same resolution against the DataFrame's analyzed
  * schema and emit constant columns, which keeps them codegen-trivial
  * literals rather than per-row work.
  */
object ColumnMeta {
  /** Shared parser for [[metadataPairs]] — `readTree` is thread-safe on a
    * configured mapper, and hoisting it avoids a per-call construction
    * (plan-time-only, but free to fix; r18 verdict hygiene note). */
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def build(meta: Map[String, String], from: Metadata = Metadata.empty): Metadata = {
    val b = new MetadataBuilder().withMetadata(from)
    meta.foreach { case (k, v) => b.putString(k, v) }
    b.build()
  }

  /** `with_metadata` analog: re-alias `colName` with its existing field
    * metadata merged with `meta` (new keys overwrite). Empty `meta` is a
    * no-op; empty keys are rejected, as the reference's ValueError does. */
  def withMetadata(df: DataFrame, colName: String, meta: Map[String, String]): DataFrame = {
    require(meta.keys.forall(_.nonEmpty), "metadata keys must be non-empty strings")
    if (meta.isEmpty) df
    else df.withColumn(colName,
      df(colName).as(colName, build(meta, df.schema(colName).metadata)))
  }

  /** `literal_with_metadata` analog: a literal column whose output field
    * carries `meta` (Spark requires the alias to attach metadata, so the
    * name rides along — the reference's `.alias(...)` idiom does too). */
  def litWithMetadata(value: Any, name: String, meta: Map[String, String]): Column = {
    require(meta.keys.forall(_.nonEmpty), "metadata keys must be non-empty strings")
    lit(value).as(name, build(meta))
  }

  /** The string-valued metadata pairs of a field, sorted by key.
    * `Metadata` exposes typed getters but no public key enumeration, so
    * enumerate through its canonical JSON form (Jackson is on Spark's own
    * classpath); non-string values — legal in Spark metadata, absent from
    * the reference's string-to-string surface — are skipped. */
  def metadataPairs(f: StructField): Seq[(String, String)] = {
    val node = jsonMapper.readTree(f.metadata.json)
    import scala.jdk.CollectionConverters._
    node.fields().asScala.toSeq.collect {
      case e if e.getValue.isTextual => e.getKey -> e.getValue.asText()
    }.sortBy(_._1)
  }

  /** `arrow_metadata(expr)` analog: all of `colName`'s metadata pairs as a
    * constant map column (key-sorted, so downstream rendering is
    * deterministic). */
  def arrowMetadata(df: DataFrame, colName: String): Column = {
    val pairs = metadataPairs(df.schema(colName))
    if (pairs.isEmpty) map().cast("map<string,string>")
    else map(pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
  }

  /** `arrow_metadata(expr, key)` analog: the value for one key, NULL when
    * absent. */
  def arrowMetadata(df: DataFrame, colName: String, key: String): Column =
    metadataPairs(df.schema(colName)).toMap.get(key) match {
      case Some(v) => lit(v)
      case None    => lit(null).cast(StringType)
    }

  /** `arrow_field` analog: (name, data_type, nullable, metadata) as a
    * constant struct column; `data_type` uses the Arrow type-name policy
    * shared with `arrow_typeof` (graft.TypeBridge). */
  def arrowField(df: DataFrame, colName: String): Column = {
    val f = df.schema(colName)
    org.apache.spark.sql.functions.struct(
      lit(f.name).as("name"),
      lit(graft.TypeBridge.arrowTypeName(f.dataType)).as("data_type"),
      lit(f.nullable).as("nullable"),
      arrowMetadata(df, colName).as("metadata"))
  }
}
