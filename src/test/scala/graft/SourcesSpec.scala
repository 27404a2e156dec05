package graft

import org.scalatest.funsuite.AnyFunSuite

/** register_record_batches analog: batch boundaries become partitions. */
class BatchSourceSpec extends AnyFunSuite {
  import SparkSpec._

  test("fromBatches preserves one partition per batch") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val batches = Seq(Seq(Row(1L), Row(2L)), Seq(Row(3L)), Seq(Row(4L), Row(5L)))
    val df = Q.fromBatches(spark, batches, schema)
    assert(df.rdd.getNumPartitions == 3)
    val perPartition = df.rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect().toSeq
    assert(perPartition == Seq(Seq(1L, 2L), Seq(3L), Seq(4L, 5L)))
  }
}

/** Three-level catalog plugin: SHOW/SELECT through graft.<ns>.<table>. */
class CatalogPluginSpec extends AnyFunSuite {
  import SparkSpec._

  test("catalog plugin resolves namespaces and tables from SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.dir.corpus", sf)
    val namespaces = spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0))
    assert(namespaces.contains("corpus"), namespaces.toSeq)
    val tables = spark.sql("SHOW TABLES IN graft.corpus")
      .collect().map(_.getString(1))
    assert(Seq("nation", "lineitem", "documents").forall(tables.contains),
      tables.toSeq)
    val rows = spark.sql(
      """SELECT n_name FROM graft.corpus.nation
        |WHERE n_regionkey = 0 ORDER BY n_nationkey""".stripMargin).collect()
    assert(rows.nonEmpty && rows.length < 25)
    // pushdown flows through the catalog-resolved DSv2 parquet table
    val plan = spark.sql(
      "SELECT n_name FROM graft.corpus.nation WHERE n_nationkey = 3")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"), plan)
    // read-only: DDL raises
    intercept[Exception](
      spark.sql("DROP TABLE graft.corpus.nation"))
  }
}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GenTable

/** DSv2 connector: correctness + evidence that pushdown actually pruned. */
class SourcesSpec extends AnyFunSuite {
  import SparkSpec._

  private def gen(rows: Int) =
    spark.read.format("graft.sources.GenTableProvider")
      .option("rows", rows.toString).load()

  test("full scan returns the generated relation") {
    val rows = gen(1000).collect()
    assert(rows.length == 1000)
    val r = rows.find(_.getLong(0) == 123L).get
    assert(r.getInt(1) == (123 % 50) && r.getDouble(2) == (123L * 31 % 997) / 10.0)
  }

  test("id predicates prune partitions at the source") {
    GenTable.rowsScanned.set(0)
    val n = gen(10000).filter(col("id") < 100).count()
    assert(n == 100)
    assert(GenTable.rowsScanned.get() < 2000,
      s"scanned ${GenTable.rowsScanned.get()} rows — id pushdown did not prune")
  }

  test("non-id predicates are evaluated at the source") {
    GenTable.rowsScanned.set(0)
    val n = gen(10000).filter(col("grp") === 7).count()
    assert(n == 200)
    assert(GenTable.rowsScanned.get() == 200,
      s"reader emitted ${GenTable.rowsScanned.get()} rows — grp filter not pushed")
  }

  test("pushed filters and pruned columns appear in the scan description") {
    val df = gen(1000).filter(col("id") >= 500).select("id", "val")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(id,500)"), scan)
    assert(scan.contains("columns=[id, val]"), scan)
  }

  test("row counts not divisible by the partition count lose no rows") {
    for (n <- Seq(1, 7, 100, 10001)) {
      val df = gen(n)
      assert(df.count() == n, s"rows=$n")
      assert(df.agg(sum("id")).collect().head.getLong(0) == n.toLong * (n - 1) / 2)
    }
  }

  test("aggregation over the connector matches the closed form") {
    val got = gen(1000).groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 20) && got.size == 50)
  }
}

/** Session facade: SQLOptions gating + registration surface. */
class GraftSessionSpec extends AnyFunSuite {
  import SparkSpec._

  private lazy val ctx = new GraftSession(spark)

  test("sql with named parameters") {
    ctx.registerParquet("gs_nation", s"$sf/nation.parquet")
    val n = ctx.sql(
      "SELECT count(*) AS n FROM gs_nation WHERE n_regionkey = :rk",
      Map("rk" -> 2)).collect().head.getLong(0)
    assert(n == 5)
  }

  test("information_schema reflects the live catalog") {
    ctx.enableInformationSchema()
    ctx.registerParquet("is_live", s"$sf/region.parquet")
    def names() = spark.sql(
      "SELECT table_name FROM information_schema.tables")
      .collect().map(_.getString(0)).toSet
    assert(names().contains("is_live"))
    // columns carry 1-based ordinals and resolved types
    val cols = spark.sql(
      """SELECT column_name, ordinal_position, data_type
        |FROM information_schema.columns WHERE table_name = 'is_live'
        |ORDER BY ordinal_position""".stripMargin).collect()
    assert(cols.map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
      == Seq(("r_regionkey", 1, "INT"), ("r_name", 2, "STRING")))
    // virtual tables are recomputed per scan: a dropped view disappears
    ctx.deregister("is_live")
    assert(!names().contains("is_live"))
    // schemata lists the session scope; the catalog itself is read-only
    assert(spark.sql("SELECT schema_name FROM information_schema.schemata")
      .collect().map(_.getString(0)).contains("session"))
    intercept[Exception] {
      spark.sql("DROP TABLE information_schema.tables").collect()
    }
  }

  test("SQLOptions denies DDL when asked") {
    val e = intercept[IllegalStateException] {
      ctx.sql("CREATE TABLE gs_t (a INT) USING PARQUET",
        options = SQLOptions().withDDL(false))
    }
    assert(e.getMessage.contains("DDL not allowed"))
  }

  test("SQLOptions denies DML when asked") {
    val e = intercept[IllegalStateException] {
      ctx.sql("INSERT INTO gs_nation VALUES (99, 'X', 0)",
        options = SQLOptions().withDML(false))
    }
    assert(e.getMessage.contains("DML not allowed"))
  }

  test("SQLOptions denies SET statements when asked") {
    val e = intercept[IllegalStateException] {
      ctx.sql("SET spark.sql.shuffle.partitions = 1",
        options = SQLOptions().withStatements(false))
    }
    assert(e.getMessage.contains("statement not allowed"))
    // and the conf was not changed
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
  }

  test("queries pass through an all-deny gate") {
    val strict = SQLOptions(allowDDL = false, allowDML = false, allowStatements = false)
    assert(ctx.sql("SELECT 1 AS one", options = strict).collect().head.getInt(0) == 1)
  }

  test("param_strings splices validated identifiers pre-parse") {
    ctx.registerParquet("gs_nation2", s"$sf/nation.parquet")
    val rows = ctx.sql(
      "SELECT $col AS k FROM $tbl WHERE $col < :lim ORDER BY k",
      params = Map("lim" -> 3),
      paramStrings = Map("tbl" -> "gs_nation2", "col" -> "n_nationkey"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(0, 1, 2))
  }

  test("param_strings rejects non-identifier values (injection)") {
    for (bad <- Seq("gs_nation2; DROP TABLE x", "a b", "x'y", "1tbl", "`q`")) {
      val e = intercept[IllegalArgumentException] {
        ctx.sql("SELECT * FROM $tbl", paramStrings = Map("tbl" -> bad))
      }
      assert(e.getMessage.contains("not a bare identifier"))
    }
    // whole-token matching: $tab must not clobber $table
    assert(GraftSession.spliceIdentifiers(
      "SELECT * FROM $table JOIN $tab", Map("table" -> "t1", "tab" -> "t2"))
      == "SELECT * FROM t1 JOIN t2")
  }
  test("param_strings replaces whole tokens and skips quoted regions") {
    // a bound prefix of an unbound placeholder is an error, not a partial
    // substitution ('$table' -> 't2le' was the failure mode of plain
    // String.replace)
    val e = intercept[IllegalArgumentException] {
      GraftSession.spliceIdentifiers(
        "SELECT * FROM $table", Map("tab" -> "t2"))
    }
    assert(e.getMessage.contains("unbound identifier placeholder $table"))
    // placeholders inside string literals, quoted identifiers and comments
    // are data, not splice points
    assert(GraftSession.spliceIdentifiers(
      "SELECT '$t', \"$t\", `$t` FROM $t -- not $t\n/* nor $t */",
      Map("t" -> "nation"))
      == "SELECT '$t', \"$t\", `$t` FROM nation -- not $t\n/* nor $t */")
    // '' escape keeps the literal open across the doubled quote
    assert(GraftSession.spliceIdentifiers(
      "SELECT 'it''s $t' FROM $t", Map("t" -> "nation"))
      == "SELECT 'it''s $t' FROM nation")
    // a bare $ with no identifier after it passes through
    assert(GraftSession.spliceIdentifiers("SELECT '$' , $t", Map("t" -> "x"))
      == "SELECT '$' , x")
  }

  test("fromSeq registers an in-memory frame") {
    val df = ctx.fromSeq(Seq((1, "a"), (2, "b")), Some("gs_mem"))
    assert(df.count() == 2)
    assert(ctx.sql("SELECT count(*) n FROM gs_mem").collect().head.getLong(0) == 2)
    ctx.deregister("gs_mem")
  }
}
