package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ColumnMeta

/** Pins the column-metadata facade (reference with_metadata /
  * arrow_metadata / arrow_field / literal_with_metadata semantics,
  * functions/__init__.py:3150-3256) against Spark's native
  * StructField.metadata plumbing. The parquet round-trip itself is
  * exercised by the fn_metadata registry entry. */
class ColumnMetaSpec extends AnyFunSuite {
  import SparkSpec._

  private def base = t(spark)

  private def t(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
  }

  test("with_metadata merges with existing metadata, new keys overwrite") {
    val once = ColumnMeta.withMetadata(base, "name",
      Map("entity" -> "x", "lang" -> "en"))
    val twice = ColumnMeta.withMetadata(once, "name", Map("lang" -> "en_US"))
    assert(ColumnMeta.metadataPairs(twice.schema("name")) ==
      Seq("entity" -> "x", "lang" -> "en_US"))
    // empty map is a no-op returning the input unchanged
    assert(ColumnMeta.withMetadata(twice, "name", Map.empty) eq twice)
    // data untouched
    assert(twice.orderBy("k").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("empty metadata keys are rejected loudly (reference ValueError)") {
    intercept[IllegalArgumentException](
      ColumnMeta.withMetadata(base, "name", Map("" -> "v")))
    intercept[IllegalArgumentException](
      ColumnMeta.litWithMetadata(1, "c", Map("" -> "v")))
  }

  test("litWithMetadata attaches metadata to a literal's output field") {
    val df = base.select(ColumnMeta.litWithMetadata("tpch", "src", Map("kind" -> "constant")))
    assert(ColumnMeta.metadataPairs(df.schema("src")) == Seq("kind" -> "constant"))
    assert(df.head().getString(0) == "tpch")
  }

  test("arrow_metadata returns the map, single-key value, NULL when absent") {
    val tagged = ColumnMeta.withMetadata(base, "name",
      Map("b" -> "2", "a" -> "1"))
    val m = tagged.select(ColumnMeta.arrowMetadata(tagged, "name").as("m"))
      .head().getMap[String, String](0)
    assert(m == Map("a" -> "1", "b" -> "2"))
    assert(tagged.select(ColumnMeta.arrowMetadata(tagged, "name", "a"))
      .head().getString(0) == "1")
    assert(tagged.select(ColumnMeta.arrowMetadata(tagged, "name", "zz"))
      .head().isNullAt(0))
    // no metadata at all → empty (non-null) map, like the reference's Map
    assert(base.select(ColumnMeta.arrowMetadata(base, "k").as("m"))
      .head().getMap[String, String](0).isEmpty)
  }

  test("arrow_field carries name, arrow type name, nullability, metadata") {
    val tagged = ColumnMeta.withMetadata(base, "name", Map("u" -> "v"))
    val r = tagged.select(ColumnMeta.arrowField(tagged, "name").as("f"))
      .head().getStruct(0)
    assert(r.getString(0) == "name")
    assert(r.getString(1) == "Utf8")
    assert(r.getBoolean(2) == tagged.schema("name").nullable)
    assert(r.getMap[String, String](3) == Map("u" -> "v"))
  }

  test("metadata survives select/filter lineage within a plan") {
    val tagged = ColumnMeta.withMetadata(base, "name", Map("u" -> "v"))
      .filter(col("k") > 0).select("k", "name")
    assert(ColumnMeta.metadataPairs(tagged.schema("name")) == Seq("u" -> "v"))
  }
}
