package graft.sources

import java.util

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `information_schema` virtual tables — the reference's
  * `SessionConfig.with_information_schema`
  * (`/root/reference/python/datafusion/context.py:193-203`, backed by
  * DataFusion's built-in `information_schema` provider): once enabled,
  * `SELECT * FROM information_schema.tables / .columns / .schemata` is
  * plain SQL over the live catalog.
  *
  * Spark has no information_schema, so this is a read-only DSv2
  * [[TableCatalog]] registered under the name `information_schema` —
  * two-part identifiers like `information_schema.tables` resolve to it
  * directly. Each virtual table is a [[LocalScan]]: the rows are catalog
  * METADATA (a handful of entries, recomputed at scan time so newly
  * registered tables appear immediately) — this is one of the few places
  * where driver-side computation is the correct design, exactly like
  * `SHOW TABLES`.
  *
  * Conventions (SQL standard / DataFusion): `ordinal_position` is
  * 1-based; `is_nullable` is `'YES'`/`'NO'`; temp views report
  * `table_schema = 'session'` and `table_type = 'VIEW'`, persistent
  * relations report their namespace and `'BASE TABLE'`.
  */
class InfoSchemaCatalog extends TableCatalog with SupportsNamespaces {

  import InfoSchema._

  private var catalogName: String = "information_schema"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  // The virtual tables live at the catalog root: `information_schema.tables`
  // parses as (catalog = information_schema, namespace = [], name = tables).
  private def rootNs(ns: Array[String]): Boolean = ns.isEmpty

  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (rootNs(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    rootNs(namespace)
  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (rootNs(namespace)) util.Map.of()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("information_schema is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (rootNs(namespace))
      schemas.keys.toArray.sorted.map(Identifier.of(Array.empty[String], _))
    else throw new NoSuchNamespaceException(namespace)

  override def tableExists(ident: Identifier): Boolean =
    rootNs(ident.namespace()) && schemas.contains(ident.name().toLowerCase)

  override def loadTable(ident: Identifier): Table =
    if (tableExists(ident)) new InfoSchemaTable(ident.name().toLowerCase)
    else throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("information_schema is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("information_schema is read-only")
}

private[sources] class InfoSchemaTable(tableName: String)
  extends Table with SupportsRead {
  import InfoSchema._

  override def name(): String = s"information_schema.$tableName"
  override def schema(): StructType = schemas(tableName)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with LocalScan {
        override def readSchema(): StructType = schemas(tableName)
        override def description(): String = name()
        // recomputed per scan: the virtual table always reflects the
        // catalog as of query execution
        override def rows(): Array[InternalRow] =
          InfoSchema.rowsFor(tableName, SparkSession.active)
      }
    }
}

object InfoSchema {

  /** Register the catalog on a session (the `with_information_schema(True)`
    * switch). Catalog plugins instantiate lazily, so a runtime conf set is
    * all that is needed. */
  def enable(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.catalog.information_schema",
      classOf[InfoSchemaCatalog].getName)

  val schemas: Map[String, StructType] = Map(
    "tables" -> StructType(Seq(
      StructField("table_catalog", StringType, nullable = false),
      StructField("table_schema", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("table_type", StringType, nullable = false))),
    "columns" -> StructType(Seq(
      StructField("table_catalog", StringType, nullable = false),
      StructField("table_schema", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("ordinal_position", IntegerType, nullable = false),
      StructField("data_type", StringType, nullable = false),
      StructField("is_nullable", StringType, nullable = false))),
    "schemata" -> StructType(Seq(
      StructField("catalog_name", StringType, nullable = false),
      StructField("schema_name", StringType, nullable = false))))

  private case class Entry(catalog: String, schema: String, name: String,
      tableType: String, fullName: String)

  private def entries(spark: SparkSession): Seq[Entry] =
    spark.catalog.listTables().collect().toSeq.map { t =>
      val temp = t.isTemporary
      val ns = Option(t.namespace).map(_.toSeq).getOrElse(Nil)
      Entry(
        catalog = Option(t.catalog).getOrElse("spark_catalog"),
        schema = if (temp || ns.isEmpty) "session" else ns.mkString("."),
        name = t.name,
        tableType = if (temp || t.tableType == "VIEW") "VIEW" else "BASE TABLE",
        fullName = if (temp || ns.isEmpty) t.name
                   else (ns :+ t.name).mkString("."))
    }.sortBy(e => (e.schema, e.name))

  private def s(v: String) = UTF8String.fromString(v)

  def rowsFor(table: String, spark: SparkSession): Array[InternalRow] =
    table match {
      case "tables" =>
        entries(spark).map(e => InternalRow(
          s(e.catalog), s(e.schema), s(e.name), s(e.tableType))).toArray
      case "columns" =>
        entries(spark).flatMap { e =>
          // a concurrently dropped view must not fail the whole scan
          Try(spark.table(e.fullName).schema).toOption.toSeq.flatMap {
            st => st.fields.zipWithIndex.map { case (f, i) =>
              InternalRow(s(e.catalog), s(e.schema), s(e.name), s(f.name),
                i + 1, s(f.dataType.sql), s(if (f.nullable) "YES" else "NO"))
            }
          }
        }.toArray
      case "schemata" =>
        entries(spark).map(e => (e.catalog, e.schema)).distinct.sorted
          .map { case (c, sc) => InternalRow(s(c), s(sc)) }.toArray
      case other =>
        throw new NoSuchTableException(
          Identifier.of(Array.empty[String], other))
    }
}
