package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming over the events table: file source → watermark →
  * tumbling-window aggregation → memory sink, checked against the batch
  * equivalent. (The reference has no event-time streaming — SURVEY.md
  * §2.11 — this is part of the additive pipeline surface.) */
class StreamingSpec extends AnyFunSuite {
  import SparkSpec._

  test("streaming windowed counts equal the batch computation") {
    val batchEvents = Q.t(spark, sf, "events")
    // file stream sources read directories: stage the single file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ev_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("ev_counts")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = batchEvents
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
