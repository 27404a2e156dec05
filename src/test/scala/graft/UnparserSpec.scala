package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unparser round-trip: for each supported plan shape, the generated SQL
  * re-executed through spark.sql must produce the original result set. */
class UnparserSpec extends AnyFunSuite {
  import SparkSpec._

  private lazy val ready: Unit = {
    Q.t(spark, sf, "nation").createOrReplaceTempView("up_nation")
    Q.t(spark, sf, "region").createOrReplaceTempView("up_region")
    Q.t(spark, sf, "customer").createOrReplaceTempView("up_customer")
  }

  private def roundtrip(df: DataFrame): Unit = {
    val sqlText = Unparser(df)
    val back = spark.sql(sqlText)
    val a = df.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"round-trip mismatch for:\n$sqlText")
  }

  test("project / filter / sort / limit round-trip") {
    ready
    roundtrip(spark.table("up_nation")
      .select(col("n_nationkey"), upper(col("n_name")).as("uname"))
      .filter(col("n_nationkey") > 5)
      .orderBy(desc("n_nationkey"))
      .limit(7))
  }

  test("aggregate with grouping round-trips") {
    ready
    roundtrip(spark.table("up_customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("total")))
  }

  test("joins round-trip across types") {
    ready
    val n = spark.table("up_nation")
    val r = spark.table("up_region")
    roundtrip(n.join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name")))
    roundtrip(n.join(r, col("n_regionkey") === col("r_regionkey"), "left_semi"))
  }

  test("set operations and distinct round-trip") {
    ready
    val a = spark.table("up_nation").select("n_regionkey")
    val b = spark.table("up_region").select("r_regionkey")
    roundtrip(a.union(a))
    roundtrip(a.distinct())
    roundtrip(a.intersect(b.withColumnRenamed("r_regionkey", "n_regionkey")))
  }

  test("window functions round-trip") {
    ready
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    roundtrip(spark.table("up_nation")
      .withColumn("rn", row_number().over(w))
      .withColumn("run", sum(col("n_nationkey"))
        .over(w.rowsBetween(Long.MinValue, 0))))
  }

  test("self-join: semi/anti qualify the ON clause, inner raises") {
    ready
    val n1 = spark.table("up_nation").as("l")
    val n2 = spark.table("up_nation").as("r")
    val cond = col("l.n_regionkey") === col("r.n_nationkey")
    // semi: output is the left leg only — legs get __uN aliases and the
    // condition is re-qualified, so the SQL re-analyzes unambiguously
    roundtrip(n1.join(n2, cond, "left_semi"))
    roundtrip(n1.join(n2, cond, "left_anti"))
    // inner self-join output carries duplicate names → loud rejection
    val e = intercept[UnsupportedOperationException] {
      Unparser(n1.join(n2, cond))
    }
    assert(e.getMessage.contains("share output column names"))
  }

  test("duckdb dialect emits the pinned text and rejects non-portable exprs") {
    ready
    // the registry query asserts generated text == oracle literal
    val df = Extras.sqlUnparseDuckdb(spark, sf)
    assert(df.count() > 0)
    // Spark-only rendering (e.g. a window) is rejected loudly in duckdb mode
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    intercept[UnsupportedOperationException] {
      Unparser(spark.table("up_nation")
        .withColumn("rn", row_number().over(w)), Unparser.DuckDb)
    }
  }

  test("duckdb dialect whitelists binary operators") {
    ready
    val n = spark.table("up_nation")
    // portable comparisons/arithmetic render with their shared spelling
    val ok = Unparser(
      n.filter(col("n_nationkey") * 2 + 1 >= col("n_regionkey") % 3),
      Unparser.DuckDb)
    assert(ok.contains(">=") && ok.contains("%"))
    // <=> has no DuckDB spelling — mapped to IS NOT DISTINCT FROM
    val ens = Unparser(
      n.filter(col("n_regionkey") <=> lit(1)), Unparser.DuckDb)
    assert(ens.contains("IS NOT DISTINCT FROM"), ens)
    // non-portable operators raise instead of leaking Spark-isms: `div`
    // (integral divide) and bitwise & parse differently or not at all
    for (bad <- Seq(
        n.select(expr("n_nationkey div 2").as("d")),
        n.select(col("n_nationkey").bitwiseAND(lit(3)).as("b")))) {
      val e = intercept[UnsupportedOperationException] {
        Unparser(bad, Unparser.DuckDb)
      }
      assert(e.getMessage.contains("does not cover"), e.getMessage)
    }
  }

  test("postgres dialect: EXISTS semi/anti, double quotes, bare OFFSET") {
    ready
    val n = spark.table("up_nation")
    val r = spark.table("up_region")
    val semi = Unparser(
      n.join(r, col("n_regionkey") === col("r_regionkey"), "left_semi"),
      Unparser.Postgres)
    assert(semi.contains("WHERE EXISTS (SELECT 1 FROM"), semi)
    assert(!semi.contains("SEMI JOIN"))
    val anti = Unparser(
      n.join(r, col("n_regionkey") === col("r_regionkey"), "left_anti"),
      Unparser.Postgres)
    assert(anti.contains("WHERE NOT EXISTS"), anti)
    val off = Unparser(n.orderBy("n_nationkey").offset(4), Unparser.Postgres)
    assert(off.endsWith("OFFSET 4") && !off.contains("LIMIT"), off)
    val cast = Unparser(
      n.select(col("n_nationkey").cast("double").as("d")), Unparser.Postgres)
    assert(cast.contains("AS DOUBLE PRECISION") && cast.contains("\"d\""), cast)
    // the registry entry pins the full text against the oracle literal
    assert(Extras.sqlUnparsePostgres(spark, sf).count() > 0)
  }

  test("mysql dialect: backticks, <=>, CHAR cast, NULLS emulation, LIMIT-all OFFSET") {
    ready
    val n = spark.table("up_nation")
    val ens = Unparser(n.filter(col("n_regionkey") <=> 1), Unparser.MySql)
    assert(ens.contains("<=>") && ens.contains("`n_regionkey`"), ens)
    // MySQL defaults match Spark's: default orderings emit no emulation key
    val asc = Unparser(n.orderBy(col("n_name")), Unparser.MySql)
    assert(asc.endsWith("ORDER BY `n_name` ASC") && !asc.contains("IS NULL"), asc)
    // non-default null ordering prepends the IS NULL key
    val nl = Unparser(n.orderBy(col("n_name").asc_nulls_last), Unparser.MySql)
    assert(nl.contains("(`n_name` IS NULL) ASC, `n_name` ASC"), nl)
    val nf = Unparser(n.orderBy(col("n_name").desc_nulls_first), Unparser.MySql)
    assert(nf.contains("(`n_name` IS NULL) DESC, `n_name` DESC"), nf)
    val off = Unparser(n.orderBy("n_nationkey").offset(2), Unparser.MySql)
    assert(off.contains("LIMIT 18446744073709551615 OFFSET 2"), off)
    assert(Extras.sqlUnparseMysql(spark, sf).count() > 0)
  }

  test("sqlite dialect: IS null-safe, storage-class casts, LIMIT -1 OFFSET, no ALL set ops") {
    ready
    val n = spark.table("up_nation")
    val ens = Unparser(n.filter(col("n_regionkey") <=> 1), Unparser.Sqlite)
    assert(ens.contains("IS 1") && !ens.contains("DISTINCT FROM"), ens)
    val cast = Unparser(
      n.select(col("n_nationkey").cast("string").as("s"),
        col("n_nationkey").cast("double").as("r")), Unparser.Sqlite)
    assert(cast.contains("AS TEXT") && cast.contains("AS REAL"), cast)
    val off = Unparser(n.orderBy("n_nationkey").offset(3), Unparser.Sqlite)
    assert(off.contains("LIMIT -1 OFFSET 3"), off)
    val a = n.select("n_regionkey")
    intercept[UnsupportedOperationException] {
      Unparser(a.intersectAll(a), Unparser.Sqlite)
    }
    intercept[UnsupportedOperationException] {
      Unparser(a.exceptAll(a), Unparser.Sqlite)
    }
    // SQLite has no date types: typed literals degrade to plain strings
    val dt = Unparser(n.filter(col("n_name") > lit(java.sql.Date.valueOf("2020-01-02"))
      .cast("string")), Unparser.Sqlite)
    assert(!dt.contains("DATE '"), dt)
    assert(Extras.sqlUnparseSqlite(spark, sf).count() > 0)
  }

  test("unsupported plans fail loudly, not silently") {
    ready
    val e = intercept[UnsupportedOperationException] {
      Unparser(spark.table("up_nation").select(
        explode(array(col("n_nationkey"))).as("x")))
    }
    assert(e.getMessage.contains("Unparser does not cover"))
  }
}
