package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the warehouse-curation operators that the row-hash oracle
  * cannot express: interval chaining, MERGE action-matrix consistency, and
  * audit-report self-consistency. */
class CurationSpec extends AnyFunSuite {
  import SparkSpec._

  /** Timestamp columns surface as java.sql.Timestamp or java.time.LocalDateTime
    * depending on the session's NTZ/java8 datetime settings — compare epoch-agnostic. */
  private def tsVal(r: org.apache.spark.sql.Row, col: String): Option[Long] =
    if (r.isNullAt(r.fieldIndex(col))) None
    else r.getAs[Any](col) match {
      case t: java.sql.Timestamp        => Some(t.getTime)
      case t: java.time.LocalDateTime   => Some(t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      case t: java.time.Instant         => Some(t.toEpochMilli)
      case other => fail(s"unexpected timestamp type ${other.getClass} in $col")
    }

  test("SCD2 intervals chain half-open with exactly one current row per customer") {
    val rows = Curation.dimScd2(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (ck, rs) =>
      assert(rs.count(_.getAs[Long]("is_current") == 1L) == 1,
        s"customer $ck must have exactly one open interval")
      val ordered = rs.sortBy(r => tsVal(r, "valid_from").get)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          // half-open chaining: each interval ends where the next begins
          assert(tsVal(a, "valid_to") == tsVal(b, "valid_from"),
            s"gap/overlap at customer $ck")
          // runs are maximal: consecutive islands differ in priority unless
          // they share the same start date (two priorities on one day)
          if (tsVal(a, "valid_from") != tsVal(b, "valid_from"))
            assert(a.getAs[String]("priority") != b.getAs[String]("priority") ||
              tsVal(a, "valid_to") == tsVal(b, "valid_from"))
        case _ =>
      }
      assert(ordered.last.isNullAt(ordered.last.fieldIndex("valid_to")))
    }
    val total = Q.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total,
      "every order must land in exactly one interval")
  }

  test("merge upsert covers the full action matrix consistently") {
    val rows = Curation.mergeUpsert(spark, sf).collect()
    val byAction = rows.groupBy(_.getAs[String]("action"))
    assert(byAction.keySet == Set("update", "insert", "keep"),
      s"nation slice must produce all three actions, got ${byAction.keySet}")
    byAction("update").foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("old_bal")) && !r.isNullAt(r.fieldIndex("delta")))
      val want = BigDecimal(r.getAs[Double]("old_bal") + r.getAs[Double]("delta"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("new_bal") == want, s"update math broken: $r")
    }
    byAction("insert").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("old_bal")))
      assert(r.getAs[Double]("new_bal") ==
        BigDecimal(r.getAs[Double]("delta"))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    byAction("keep").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("delta")))
    }
    // keys are unique — MERGE emits each key exactly once
    assert(rows.map(_.getAs[Long]("custkey")).distinct.length == rows.length)
  }

  test("data-quality audit is self-consistent and the generated corpus is clean") {
    val rows = Curation.dqAudit(spark, sf).collect()
    val get = rows.map(r => (r.getAs[String]("check"), r.getAs[String]("tbl")) -> r).toMap
    // structural integrity the generator guarantees
    assert(get(("orphan_order_fk", "lineitem")).getAs[Long]("violations") == 0L)
    assert(get(("dup_order_pk", "orders")).getAs[Long]("violations") == 0L)
    assert(get(("null_custkey", "orders")).getAs[Long]("violations") == 0L)
    assert(get(("empty_text", "documents")).getAs[Long]("violations") == 0L)
    // pass flag must agree with the violation count
    rows.foreach { r =>
      val expected =
        if (r.getAs[String]("check") == "total_rows") 1L
        else if (r.getAs[Long]("violations") == 0L) 1L else 0L
      assert(r.getAs[Long]("pass") == expected, s"pass flag inconsistent: $r")
    }
    // totals match the real tables
    assert(get(("total_rows", "lineitem")).getAs[Long]("violations") ==
      Q.t(spark, sf, "lineitem").count())
  }
}
