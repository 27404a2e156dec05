package graft.sources

import java.io.File
import java.nio.ByteBuffer
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file read/write — the engine's `read_avro` analog
  * (reference `/root/reference/python/datafusion/context.py:1994`, `:1266`).
  *
  * Built directly on the Avro Java core (`avro-1.12.1` ships with Spark;
  * the `spark-avro` connector does not), as a distributed Row⇄GenericRecord
  * pipeline: writes produce one standard Avro object-container file per
  * partition (deflate codec, readable by any Avro implementation),
  * reads run one file per task with schema inferred from the container
  * header. Types covered: boolean/int/long/float/double/string/binary,
  * date (logical `date`), timestamp (logical `timestamp-micros`), and
  * arrays of these; nullable columns map to `["null", T]` unions.
  */
object AvroIO {

  // ---- schema mapping ----

  def toAvroSchema(schema: StructType, recordName: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = toAvroType(f.dataType, recordName + "_" + f.name)
      val t = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(elem, containsNull) =>
      val e = toAvroType(elem, name + "_item")
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), e)) else e)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not support ${other.simpleString}")
  }

  def fromAvroSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"not a record: $schema")
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = fromAvroType(f.schema())
      StructField(f.name(), t, nullable)
    }.toSeq)
  }

  private def fromAvroType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported: $s")
      (fromAvroType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
        (TimestampType, false)
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros])
        (TimestampNTZType, false)
      else (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (e, n) = fromAvroType(s.getElementType)
      (ArrayType(e, n), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  // ---- value conversion ----

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: Timestamp, TimestampType) =>
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    case (ldt: java.time.LocalDateTime, TimestampNTZType) =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(e, _)) =>
      seq.map(toAvroValue(_, e)).asJava
    case (other, _) => other
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (micros: java.lang.Long, TimestampType) =>
      // floorDiv/floorMod so pre-1970 micros land on the earlier millisecond
      // with a non-negative nano remainder (setNanos rejects negatives)
      val ts = new Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (micros: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (bb: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (arr: java.util.Collection[_], ArrayType(e, _)) =>
      arr.asScala.map(fromAvroValue(_, e)).toSeq
    case (other, _) => other
  }

  // ---- distributed IO ----

  /** Write `df` as one Avro container file per partition under `dir`.
    *
    * Paths are `java.io.File`, so writer tasks and the reader's directory
    * listing must see the same filesystem: local mode (this project's
    * target) or a shared mount (NFS). A multi-node deployment would route
    * these through Hadoop `FileSystem` instead; the Avro encode/decode and
    * the per-partition parallelism carry over unchanged. */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "graft_row").toString
    val d = new File(dir)
    d.mkdirs()
    // overwrite semantics: drop stale part files from a previous run with
    // a different partition count (the reader globs every .avro file)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).foreach(_.delete())
    df.rdd.mapPartitionsWithIndex { (i, iter) =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      writer.setCodec(CodecFactory.deflateCodec(6))
      writer.create(avroSchema, new File(dir, f"part-$i%05d.avro"))
      iter.foreach { row =>
        val rec = new GenericData.Record(avroSchema)
        schema.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(f.name, toAvroValue(row.get(j), f.dataType))
        }
        writer.append(rec)
      }
      writer.close()
      Iterator.empty[Int]
    }.count(): Unit
  }

  /** Read a directory of Avro container files (from [[writeAvro]] or any
    * Avro producer) — schema from the container header, one file per task. */
  def readAvro(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val schema = {
      val r = new DataFileReader[GenericRecord](
        new File(files.head), new GenericDatumReader[GenericRecord]())
      try fromAvroSchema(r.getSchema) finally r.close()
    }
    val rows = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { path =>
        val reader = new DataFileReader[GenericRecord](
          new File(path), new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (reader.hasNext) {
          val rec = reader.next()
          out += Row.fromSeq(schema.fields.toSeq.map(f =>
            fromAvroValue(rec.get(f.name), f.dataType)))
        }
        reader.close()
        out.iterator
      }
    spark.createDataFrame(rows, schema)
  }
}
