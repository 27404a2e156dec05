package graft

import org.apache.spark.sql.types._

/** Type-mapping policy from SURVEY.md §1.2 for engine types Spark lacks
  * (reference type map `crates/core/src/common/data_type.rs:101-263`),
  * pinned by TypeBridgeSpec so the documented widenings are executable
  * behavior, not prose:
  *
  *  - unsigned ints (`data_type.rs:131-150`) widen to the next signed type
  *    that holds the full range: UInt8→Short, UInt16→Int, UInt32→Long,
  *    UInt64→Decimal(20,0);
  *  - Float16 promotes to Float;
  *  - Decimal256 (`data_type.rs:236-255`) exceeds Spark's precision-38
  *    ceiling and is rejected loudly (never silently truncated);
  *  - Time64 (`data_type.rs:181-190`) is carried as microseconds-of-day in
  *    a Long with explicit render/parse helpers.
  */
object TypeBridge {

  /** Spark type for an engine/Arrow type name. */
  def widen(arrowType: String): DataType = arrowType.toLowerCase match {
    case "uint8" => ShortType
    case "uint16" => IntegerType
    case "uint32" => LongType
    case "uint64" => DecimalType(20, 0)
    case "float16" => FloatType
    case "time32_s" | "time32_ms" | "time64_us" => LongType // µs of day
    case "decimal256" => throw new UnsupportedOperationException(
      "Decimal256 exceeds Spark's DecimalType precision ceiling of 38 " +
        "(SURVEY.md §1.2); cast down to Decimal128 at the source")
    case other => throw new IllegalArgumentException(
      s"no widening rule for engine type '$other'")
  }

  /** UInt64 payload (arriving as the raw signed-64 bit pattern) → exact
    * unsigned value as Decimal(20,0). */
  def uint64ToDecimal(bits: Long): java.math.BigDecimal =
    new java.math.BigDecimal(
      if (bits >= 0) java.math.BigInteger.valueOf(bits)
      else java.math.BigInteger.valueOf(bits)
        .add(java.math.BigInteger.ONE.shiftLeft(64)))

  /** Smaller unsigned payloads → the widened signed value. */
  def uint8ToShort(bits: Byte): Short = (bits & 0xff).toShort
  def uint16ToInt(bits: Short): Int = bits & 0xffff
  def uint32ToLong(bits: Int): Long = bits & 0xffffffffL

  /** Arrow type name of a Spark type — the `arrow_typeof` analog
    * (reference `functions/__init__.py` arrow_typeof; SURVEY §2.9). The
    * inverse direction of [[widen]]: the name the engine would report for
    * a value of this Spark type at the Arrow boundary. */
  def arrowTypeName(dt: DataType): String = dt match {
    case BooleanType => "Boolean"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "Utf8"
    case BinaryType => "Binary"
    case DateType => "Date32"
    case TimestampType => "Timestamp(Microsecond, Some(\"UTC\"))"
    case TimestampNTZType => "Timestamp(Microsecond, None)"
    case d: DecimalType => s"Decimal128(${d.precision}, ${d.scale})"
    case ArrayType(e, _) => s"List(${arrowTypeName(e)})"
    case StructType(fields) =>
      fields.map(f => s"${f.name}: ${arrowTypeName(f.dataType)}")
        .mkString("Struct(", ", ", ")")
    case MapType(k, v, _) => s"Map(${arrowTypeName(k)}, ${arrowTypeName(v)})"
    case other => throw new IllegalArgumentException(
      s"no Arrow name for ${other.simpleString}")
  }

  /** Time64(µs) render/parse: microseconds-of-day ⇄ HH:mm:ss.SSSSSS. */
  def time64Render(microsOfDay: Long): String = {
    require(microsOfDay >= 0 && microsOfDay < 86400000000L,
      s"out of day range: $microsOfDay")
    val s = microsOfDay / 1000000L
    f"${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d.${microsOfDay % 1000000L}%06d"
  }
  def time64Parse(t: String): Long = {
    val parts = t.split("[:.]")
    require(parts.length == 4, s"expected HH:mm:ss.SSSSSS, got $t")
    require(parts(3).length <= 6, s"fraction wider than microseconds: $t")
    val (h, m, s) = (parts(0).toLong, parts(1).toLong, parts(2).toLong)
    require(h >= 0 && h < 24 && m >= 0 && m < 60 && s >= 0 && s < 60,
      s"field out of range: $t")
    (h * 3600 + m * 60 + s) * 1000000L + parts(3).padTo(6, '0').toLong
  }
}
