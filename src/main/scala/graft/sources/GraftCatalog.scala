package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Three-level catalog plugin — the engine's analog of the reference's
  * pluggable catalog providers (`/root/reference/python/datafusion/
  * catalog.py:237-329`, `CatalogProvider`/`Schema` ABCs): registered via
  * `spark.sql.catalog.<name>=graft.sources.GraftCatalog`, it exposes each
  * configured corpus directory as a namespace and every parquet table in
  * it as `<name>.<namespace>.<table>`, resolvable from plain SQL with
  * full Catalyst pushdown (reads delegate to Spark's parquet DSv2 table,
  * so partition pruning / filter pushdown behave exactly like a direct
  * `spark.read.parquet`).
  *
  * Configuration: one `dir.<namespace> = /path/to/dir` option per
  * namespace, e.g. `spark.sql.catalog.graft.dir.sf001=/root/testdata/sf0.01`.
  * Read-only by design: DDL against the corpus raises.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var dirs: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dirs = options.asCaseSensitiveMap().asScala.toMap.collect {
      case (k, v) if k.startsWith("dir.") => k.stripPrefix("dir.") -> v
    }
  }

  override def name(): String = catalogName

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    dirs.keys.toArray.sorted.map(Array(_))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && dirs.contains(namespace.head)

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace))
      util.Map.of("location", dirs(namespace.head))
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("read-only catalog")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("read-only catalog")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  // ---- tables ----

  private def dirFor(namespace: Array[String]): String =
    if (namespaceExists(namespace)) dirs(namespace.head)
    else throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File(dirFor(namespace))
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => Identifier.of(namespace, f.getName.stripSuffix(".parquet")))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && dirs.contains(ident.namespace().head) &&
      new java.io.File(dirs(ident.namespace().head), s"${ident.name()}.parquet")
        .exists()

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = s"${dirFor(ident.namespace())}/${ident.name()}.parquet"
    val provider = new ParquetDataSourceV2()
    val options = new CaseInsensitiveStringMap(util.Map.of("path", path))
    val schema: StructType = provider.inferSchema(options)
    provider.getTable(schema, provider.inferPartitioning(options),
      options.asCaseSensitiveMap())
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")
}
