package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Result-delivery surface (SURVEY.md §2.11 — the reference's "streaming"
  * is incremental result iteration, not event-time processing) and writer
  * option coverage (§2.2). */
class InterchangeSpec extends AnyFunSuite {
  import SparkSpec._

  test("execute_stream analog: toLocalIterator delivers all rows lazily") {
    val df = Q.t(spark, sf, "orders").orderBy("o_orderkey")
    val it = df.toLocalIterator()
    var n = 0L
    var lastKey = -1L
    while (it.hasNext) {
      val r = it.next()
      assert(r.getLong(0) > lastKey) // ordered, incremental
      lastKey = r.getLong(0)
      n += 1
    }
    assert(n == df.count())
  }

  test("execute_stream_partitioned analog: per-partition iteration") {
    val df = Q.t(spark, sf, "orders").repartition(4)
    val counts = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(counts.length == 4 && counts.sum == df.count())
  }

  test("parquet writer options: zstd compression + per-column bloom filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_opts").toString
    Q.t(spark, sf, "part")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#p_partkey", "true")
      .parquet(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.contains("zstd")))
    val back = spark.read.parquet(dir)
    assert(back.count() == Q.t(spark, sf, "part").count())
    assert(back.schema.fieldNames.sorted
      .sameElements(Q.t(spark, sf, "part").schema.fieldNames.sorted))
  }

  test("arrow IPC round-trip preserves schema, rows and partitioning") {
    import org.apache.spark.sql.graftarrow.ArrowBridge
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow").toString
    val src = Q.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
      .repartition(3)
    val written = ArrowBridge.writeArrowFiles(src, dir, maxRecordsPerBatch = 100)
    assert(written == src.count())
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrows"))
    assert(files.length == 3) // one IPC stream per partition
    val back = ArrowBridge.readArrowFiles(spark, dir)
    assert(back.schema == src.schema) // incl. timestamp + nullability
    assert(back.rdd.getNumPartitions == 3) // one ingest task per file
    val a = src.orderBy("o_orderkey").collect().map(_.toString).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("avro round-trip preserves schema and rows incl. timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    val src = Q.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
      .repartition(2)
    graft.sources.AvroIO.writeAvro(src, dir)
    val back = graft.sources.AvroIO.readAvro(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    val a = src.orderBy("o_orderkey").collect().map(_.toString).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("avro round-trip handles pre-1970 timestamps (negative micros)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_neg").toString
    val src = Seq(
      (1L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999")),
      (2L, java.sql.Timestamp.valueOf("1955-06-15 04:30:00.123456")),
      (3L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00.000001"))
    ).toDF("id", "ts").repartition(1)
    graft.sources.AvroIO.writeAvro(src, dir)
    val back = graft.sources.AvroIO.readAvro(spark, dir)
    val a = src.orderBy("id").collect().map(_.toString).toSeq
    val b = back.orderBy("id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("catalog introspection: SHOW TABLES and DESCRIBE") {
    val ctx = new GraftSession(spark)
    ctx.registerParquet("ic_nation", s"$sf/nation.parquet")
    assert(ctx.tableNames.contains("ic_nation"))
    val described = spark.sql("DESCRIBE ic_nation")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described("n_nationkey") == "int" && described("n_name") == "string")
    val shown = spark.sql("SHOW TABLES").collect().map(_.getString(1))
    assert(shown.contains("ic_nation"))
    ctx.deregister("ic_nation")
  }
}
