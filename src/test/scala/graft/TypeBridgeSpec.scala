package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SURVEY.md §1.2 type-widening policy as executable behavior. */
class TypeBridgeSpec extends AnyFunSuite {

  test("unsigned ints widen to the next signed type holding the full range") {
    assert(TypeBridge.widen("uint8") == ShortType)
    assert(TypeBridge.widen("uint16") == IntegerType)
    assert(TypeBridge.widen("uint32") == LongType)
    assert(TypeBridge.widen("uint64") == DecimalType(20, 0))
    assert(TypeBridge.widen("float16") == FloatType)
  }

  test("unsigned payload widening preserves the full unsigned range") {
    assert(TypeBridge.uint8ToShort(0xff.toByte) == 255)
    assert(TypeBridge.uint8ToShort(0) == 0)
    assert(TypeBridge.uint16ToInt(0xffff.toShort) == 65535)
    assert(TypeBridge.uint32ToLong(0xffffffff) == 4294967295L)
    // -1L bit pattern == 2^64 - 1 unsigned
    assert(TypeBridge.uint64ToDecimal(-1L) ==
      new java.math.BigDecimal("18446744073709551615"))
    assert(TypeBridge.uint64ToDecimal(Long.MaxValue) ==
      new java.math.BigDecimal("9223372036854775807"))
    // max fits Decimal(20,0)
    assert(TypeBridge.uint64ToDecimal(-1L).precision <= 20)
  }

  test("Decimal256 is rejected loudly, never truncated") {
    val e = intercept[UnsupportedOperationException](TypeBridge.widen("decimal256"))
    assert(e.getMessage.contains("precision ceiling of 38"))
  }

  test("Time64 carries as micros-of-day with exact render/parse") {
    assert(TypeBridge.widen("time64_us") == LongType)
    assert(TypeBridge.time64Render(0L) == "00:00:00.000000")
    assert(TypeBridge.time64Render(86399999999L) == "23:59:59.999999")
    val micros = (13L * 3600 + 45 * 60 + 7) * 1000000L + 123456
    assert(TypeBridge.time64Render(micros) == "13:45:07.123456")
    assert(TypeBridge.time64Parse("13:45:07.123456") == micros)
    assert(TypeBridge.time64Parse(TypeBridge.time64Render(micros)) == micros)
    intercept[IllegalArgumentException](TypeBridge.time64Render(86400000000L))
  }

  test("Time64 parse rejects malformed input loudly") {
    intercept[IllegalArgumentException](TypeBridge.time64Parse("13:45:07.1234567"))
    intercept[IllegalArgumentException](TypeBridge.time64Parse("24:00:00.000000"))
    intercept[IllegalArgumentException](TypeBridge.time64Parse("13:60:07.000000"))
    intercept[IllegalArgumentException](TypeBridge.time64Parse("13:45:61.000000"))
  }
}
