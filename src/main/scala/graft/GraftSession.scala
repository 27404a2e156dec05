package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.logical.Command

/** SQL execution gate (reference `SQLOptions`,
  * `/root/reference/python/datafusion/context.py:469-530`): allow/deny
  * DDL, DML and statements before execution. */
case class SQLOptions(
    allowDDL: Boolean = true,
    allowDML: Boolean = true,
    allowStatements: Boolean = true) {
  def withDDL(allow: Boolean): SQLOptions = copy(allowDDL = allow)
  def withDML(allow: Boolean): SQLOptions = copy(allowDML = allow)
  def withStatements(allow: Boolean): SQLOptions = copy(allowStatements = allow)
}

/** Session facade mirroring the reference's `SessionContext`
  * (`/root/reference/python/datafusion/context.py:532`): table
  * registration per format, SQL with named parameters and a DDL/DML gate,
  * and in-memory frame construction — all thin wrappers over
  * `SparkSession`, which supplies catalog, optimizer and execution. */
class GraftSession(val spark: SparkSession) {

  /** ctx.sql(query, options, param_values, param_strings) — typed
    * parameters use Spark's `:name` binding; `paramStrings` splices
    * IDENTIFIERS (table/column names — things value binding cannot
    * parameterize) into `$name` placeholders BEFORE parsing, the
    * reference's `replace_placeholders_with_strings`
    * (`/root/reference/src/context.rs:541`, `context.py:692-756`). Each
    * value must be a bare (optionally dotted) identifier — anything else
    * (quotes, spaces, semicolons) is rejected, so the splice cannot smuggle
    * SQL past the gate. The gate classifies the spliced, parsed plan. */
  def sql(query: String, params: Map[String, Any] = Map.empty,
      options: SQLOptions = SQLOptions(),
      paramStrings: Map[String, String] = Map.empty): DataFrame = {
    val spliced = GraftSession.spliceIdentifiers(query, paramStrings)
    val plan = spark.sessionState.sqlParser.parsePlan(spliced)
    classify(plan) match {
      case "ddl" if !options.allowDDL =>
        throw new IllegalStateException(s"DDL not allowed by SQLOptions: $query")
      case "dml" if !options.allowDML =>
        throw new IllegalStateException(s"DML not allowed by SQLOptions: $query")
      case "statement" if !options.allowStatements =>
        throw new IllegalStateException(s"statement not allowed by SQLOptions: $query")
      case _ =>
    }
    if (params.isEmpty) spark.sql(spliced) else spark.sql(spliced, params)
  }

  private def classify(plan: LogicalPlan): String = plan match {
    case _: InsertIntoStatement => "dml"
    case c: Command =>
      val n = c.nodeName
      if (n.contains("Insert") || n.contains("Delete") || n.contains("Update")
        || n.contains("Merge")) "dml"
      else if (n.contains("Set") || n.contains("Reset")) "statement"
      else "ddl"
    case _ => "query"
  }

  // --- registration surface (reference register_*, context.py:1062-1297) ---
  def registerParquet(name: String, path: String): Unit =
    spark.read.parquet(path).createOrReplaceTempView(name)
  def registerCsv(name: String, path: String,
      options: Map[String, String] = Map("header" -> "true")): Unit =
    spark.read.options(options).csv(path).createOrReplaceTempView(name)
  def registerJson(name: String, path: String): Unit =
    spark.read.json(path).createOrReplaceTempView(name)
  /** read_avro/register_avro (context.py:1994, 1266) — AvroIO-backed. */
  def readAvro(dir: String): DataFrame =
    graft.sources.AvroIO.readAvro(spark, dir)
  def registerAvro(name: String, dir: String): Unit =
    readAvro(dir).createOrReplaceTempView(name)
  /** read_arrow/from_arrow (context.py:2025, 839) — Arrow IPC directory. */
  def readArrow(dir: String): DataFrame =
    org.apache.spark.sql.graftarrow.ArrowBridge.readArrowFiles(spark, dir)
  def registerArrow(name: String, dir: String): Unit =
    readArrow(dir).createOrReplaceTempView(name)
  /** register_record_batches (context.py:1002-1060). */
  def registerBatches(name: String,
      batches: Seq[Seq[org.apache.spark.sql.Row]],
      schema: org.apache.spark.sql.types.StructType): Unit =
    Q.fromBatches(spark, batches, schema).createOrReplaceTempView(name)
  def registerView(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)
  def deregister(name: String): Unit =
    spark.catalog.dropTempView(name)

  def table(name: String): DataFrame = spark.table(name)
  def tableNames: Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  /** from_pydict/from_pylist analog (context.py:783-887). */
  def fromSeq[T <: Product : reflect.runtime.universe.TypeTag](
      rows: Seq[T], name: Option[String] = None): DataFrame = {
    val df = spark.createDataFrame(rows)
    name.foreach(df.createOrReplaceTempView)
    df
  }
}

object GraftSession {
  /** One identifier part, optionally dotted (`db.table`). Deliberately
    * narrower than what quoting would allow: a spliced value can only ever
    * name a relation or column, never extend the statement. */
  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*".r

  /** Pre-parse `$name` → identifier substitution (reference
    * `replace_placeholders_with_strings`, context.rs:541). Longest names
    * substitute first so `$tab` never clobbers `$table`'s placeholder. */
  def spliceIdentifiers(query: String, idents: Map[String, String]): String =
    idents.toSeq.sortBy(-_._1.length).foldLeft(query) {
      case (q, (name, value)) =>
        require(IdentRe.pattern.matcher(value).matches(),
          s"param_strings value for $$$name is not a bare identifier: '$value'")
        q.replace("$" + name, value)
    }
}
