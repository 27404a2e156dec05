package org.apache.spark.sql.graftarrow

import java.io.{File, FileInputStream, FileOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.{FieldVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

/** Arrow IPC interchange — the engine's analog of the reference's
  * Arrow-native boundary: `__arrow_c_stream__` export
  * (`/root/reference/python/datafusion/dataframe.py:1780-1816`) and
  * `read_arrow`/`from_arrow` ingestion (`context.py:2025`, `:839`).
  *
  * Export writes one standard Arrow IPC *stream* file per partition
  * (readable by any Arrow implementation — pyarrow, arrow-rs, DataFusion);
  * ingestion reads a directory of such files back into a DataFrame, schema
  * inferred from the stream header. Both sides run distributed: encoding /
  * decoding happens per partition on executors through Spark's own
  * columnar Arrow writer and `ArrowColumnVector` (zero-copy on the read
  * side until row conversion). Lives under `org.apache.spark.sql` because
  * `ArrowWriter`/`internalCreateDataFrame` are `private[sql]` — the same
  * access route Spark's python/connect boundaries use.
  */
object ArrowBridge {

  /** Write `df` as one Arrow IPC stream file per partition under `dir`.
    * Returns the total row count (forces the job). */
  def writeArrowFiles(df: DataFrame, dir: String, maxRecordsPerBatch: Int): Long = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val d = new File(dir)
    d.mkdirs()
    // overwrite semantics: a previous run with more partitions must not
    // leave stale part files for the glob-based reader to re-ingest
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrows")).foreach(_.delete())
    df.queryExecution.toRdd.mapPartitionsWithIndex { (i, iter) =>
      val arrowSchema = ArrowUtils.toArrowSchema(
        schema, tz, errorOnDuplicatedFieldNames = true, largeVarTypes = false)
      val allocator = ArrowUtils.rootAllocator
        .newChildAllocator(s"graft-arrow-write-$i", 0, Long.MaxValue)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val writer = ArrowWriter.create(root)
      val os = new FileOutputStream(new File(dir, f"part-$i%05d.arrows"))
      val sw = new ArrowStreamWriter(root, null, os.getChannel)
      try {
        sw.start()
        var total = 0L
        var inBatch = 0
        while (iter.hasNext) {
          writer.write(iter.next())
          total += 1; inBatch += 1
          if (inBatch == maxRecordsPerBatch) {
            writer.finish(); sw.writeBatch(); writer.reset(); inBatch = 0
          }
        }
        if (inBatch > 0 || total == 0L) {
          writer.finish(); sw.writeBatch(); writer.reset()
        }
        sw.end()
        Iterator.single(total)
      } finally {
        sw.close(); os.close(); root.close(); allocator.close()
      }
    }.fold(0L)(_ + _)
  }

  /** Schema of an Arrow IPC stream file (header only — no batch is read). */
  def readSchema(path: String): StructType = {
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-arrow-schema", 0, Long.MaxValue)
    val reader = new ArrowStreamReader(new FileInputStream(path), allocator)
    try ArrowUtils.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
    finally { reader.close(); allocator.close() }
  }

  /** Read a directory of Arrow IPC stream files (as produced by
    * [[writeArrowFiles]] or any Arrow producer) into a DataFrame — one
    * input file per task, schema taken from the stream header. */
  def readArrowFiles(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrows")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .arrows files under $dir")
    val schema = readSchema(files.head)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = classic.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap[InternalRow] { path =>
        val allocator = ArrowUtils.rootAllocator
          .newChildAllocator("graft-arrow-read", 0, Long.MaxValue)
        val reader = new ArrowStreamReader(new FileInputStream(path), allocator)
        try {
          val root = reader.getVectorSchemaRoot
          val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          while (reader.loadNextBatch()) {
            val cols: Array[ColumnVector] = root.getFieldVectors.asScala
              .map(v => new ArrowColumnVector(v.asInstanceOf[FieldVector]): ColumnVector)
              .toArray
            val batch = new ColumnarBatch(cols, root.getRowCount)
            val it = batch.rowIterator()
            while (it.hasNext) out += it.next().copy()
          }
          out.iterator
        } finally { reader.close(); allocator.close() }
      }
    classic.internalCreateDataFrame(rdd, schema)
  }
}
