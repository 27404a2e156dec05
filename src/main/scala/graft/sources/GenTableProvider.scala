package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableProvider` with filter + projection pushdown — the
  * Spark-native analog of the reference's pyarrow-dataset foreign scan
  * (`/root/reference/crates/core/src/dataset.rs:1-123`,
  * `dataset_exec.rs:152-239`, `pyarrow_filter_expression.rs:32-180`): a
  * pluggable table whose scan receives the projected columns and a
  * conjunctive filter from the engine, prunes partitions by `id` range,
  * and evaluates residual predicates at the source.
  *
  * The table is a deterministic generator, `rows` rows of
  * `(id BIGINT, grp INT, val DOUBLE)` with `grp = id % 50`,
  * `val = (id * 31 % 997) / 10.0` — reproducible in any SQL oracle via a
  * series generator. Usage:
  * `spark.read.format("graft.sources.GenTableProvider").option("rows", n).load()`.
  */
class GenTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(Option(properties.get("rows")).map(_.toLong).getOrElse(1000L))
}

object GenTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false)))
  val NumPartitions = 8

  /** rows scanned post-pushdown, for tests asserting pruning happened */
  val rowsScanned = new java.util.concurrent.atomic.AtomicLong(0L)

  def valueAt(id: Long): (Long, Int, Double) =
    (id, (id % 50).toInt, (id * 31 % 997) / 10.0)
}

class GenTable(rows: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows)
}

class GenScanBuilder(rows: Long) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GenTable.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo(a, _) => GenTable.schema.fieldNames.contains(a)
      case GreaterThan(a, _) => GenTable.schema.fieldNames.contains(a)
      case GreaterThanOrEqual(a, _) => GenTable.schema.fieldNames.contains(a)
      case LessThan(a, _) => GenTable.schema.fieldNames.contains(a)
      case LessThanOrEqual(a, _) => GenTable.schema.fieldNames.contains(a)
      case _ => false
    }
    pushed = supported
    residual // engine re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GenScan(rows, pushed, required)
}

class GenScan(rows: Long, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GenScan(rows=$rows, pushed=[${pushed.mkString(", ")}], " +
      s"columns=[${required.fieldNames.mkString(", ")}])"

  /** id bounds implied by the pushed filters → partition pruning. */
  private def idBounds: (Long, Long) = {
    var lo = 0L; var hi = rows - 1
    pushed.foreach {
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v)
      case _ =>
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = idBounds
    // ceiling division: a floor step drops the tail ids when rows is not
    // a multiple of NumPartitions
    val step = math.max(1L,
      (rows + GenTable.NumPartitions - 1) / GenTable.NumPartitions)
    (0L until GenTable.NumPartitions)
      .map(p => (p * step, math.min((p + 1) * step - 1, rows - 1)))
      .filter { case (s, e) => e >= lo && s <= hi } // prune by id range
      .map { case (s, e) =>
        GenPartition(math.max(s, lo), math.min(e, hi)): InputPartition
      }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(pushed, required)
}

case class GenPartition(start: Long, end: Long) extends InputPartition

class GenReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1

      private def matches(grp: Int, value: Double): Boolean = pushed.forall {
        case EqualTo("grp", v: Int) => grp == v
        case GreaterThan("grp", v: Int) => grp > v
        case GreaterThanOrEqual("grp", v: Int) => grp >= v
        case LessThan("grp", v: Int) => grp < v
        case LessThanOrEqual("grp", v: Int) => grp <= v
        case EqualTo("val", v: Double) => value == v
        case GreaterThan("val", v: Double) => value > v
        case GreaterThanOrEqual("val", v: Double) => value >= v
        case LessThan("val", v: Double) => value < v
        case LessThanOrEqual("val", v: Double) => value <= v
        case _ => true // id filters already applied via partition bounds
      }

      override def next(): Boolean = {
        while (id < p.end) {
          id += 1
          val (_, grp, value) = GenTable.valueAt(id)
          if (matches(grp, value)) { GenTable.rowsScanned.incrementAndGet(); return true }
        }
        false
      }
      override def get(): InternalRow = {
        val (i, grp, value) = GenTable.valueAt(id)
        val values: Array[Any] = required.fieldNames.map[Any] {
          case "id" => i
          case "grp" => grp
          case "val" => value
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = {}
    }
  }
}
