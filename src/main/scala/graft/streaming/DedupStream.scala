package graft.streaming

import graft.{Pipeline, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-incremental MinHash dedup — the ingest-time posture of
  * [[graft.Pipeline.dedupIncremental]] run as a Structured Streaming
  * pipeline (reference exposes only batch dedup-style joins; the
  * streaming arrangement is the 100 TB ingest design this library adds):
  *
  *   - the already-ingested half of the corpus becomes a PRECOMPUTED
  *     signature/band table (at production scale this is a maintained
  *     table, not recomputed per batch) — localCheckpointed once;
  *   - the "new" half arrives as parquet files in a watched directory,
  *     consumed with `Trigger.AvailableNow` + `maxFilesPerTrigger 1`, so
  *     every micro-batch sees only the newly-landed file;
  *   - `foreachBatch` runs the SAME band-bucket join + lane-agreement
  *     estimate against the static reference and appends each batch's
  *     verdict rows to the sink — each new doc is scanned exactly once,
  *     and new×new pairs are never generated.
  *
  * Returns the accumulated sink as a DataFrame ordered like the batch
  * operator, so equivalence is a direct row-for-row comparison. */
object DedupStream {

  /** Run the streaming incremental dedup over `d`'s documents; `files`
    * controls how many arrival files (micro-batches) the new half is
    * split into. */
  def dedupIncrementalStream(
      s: SparkSession, d: String, files: Int = 4): DataFrame = {
    val docs = Q.t(s, d, "documents")
    val cutRow = docs.agg((max(col("doc_id")).cast("long") / 2).cast("long"))
      .head()
    require(!cutRow.isNullAt(0),
      "dedupIncrementalStream: documents table is empty — nothing to ingest")
    val cut = cutRow.getLong(0)

    // Reference half: precomputed band table (the maintained-state side).
    val refBands = docs.filter(col("doc_id") <= cut)
      .select(col("doc_id"), Pipeline.minhashSignature.as("mh"))
      .select(col("doc_id"), col("mh"),
        explode(Pipeline.minhashBandStructs).as("k"))
      .select(col("doc_id").as("ref_id"), col("mh").as("mh_r"),
        col("k.band").as("band"), col("k.bh").as("bh"))
      .localCheckpoint()

    // New half lands as `files` parquet files in a watched directory.
    val newDocs = docs.filter(col("doc_id") > cut)
    val inDir = java.nio.file.Files.createTempDirectory("graft_ing_in")
    val outDir = java.nio.file.Files.createTempDirectory("graft_ing_out")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ing_ck")
    newDocs.withColumn("f", pmod(col("doc_id"), lit(files)))
      .write.partitionBy("f").mode("overwrite").parquet(inDir.toString)

    val schema = newDocs.schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/f=*")

    try runStream(s, stream, refBands, outDir, ckDir)
    finally Seq(inDir, ckDir, outDir).foreach(IvfStream.deleteRecursively)
  }

  private def runStream(s: SparkSession,
      stream: DataFrame, refBands: DataFrame,
      outDir: java.nio.file.Path, ckDir: java.nio.file.Path): DataFrame = {
    val q = stream.writeStream
      .option("checkpointLocation", ckDir.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch: band the arrivals, bucket-join the static reference,
        // verify lane agreement, aggregate per new doc — complete within
        // the batch because new×ref evidence never spans arrivals
        val nb = batch
          .select(col("doc_id"), Pipeline.minhashSignature.as("mh"))
          .select(col("doc_id"), col("mh"),
            explode(Pipeline.minhashBandStructs).as("k"))
          .select(col("doc_id").as("new_id"), col("mh").as("mh_n"),
            col("k.band").as("band2"), col("k.bh").as("bh2"))
        val pairs = nb.join(refBands,
            col("band2") === col("band") && col("bh2") === col("bh"))
          .select(col("new_id"), col("ref_id"),
            round(expr(s"size(filter(zip_with(mh_n, mh_r, (x, y) -> x = y), " +
              s"v -> v)) / cast(${Pipeline.NumHashes} as double)"), 4)
              .as("est_jaccard"))
          .distinct()
          .filter(col("est_jaccard") >= 0.35)
        val perNew = pairs.groupBy("new_id")
          .agg(count(lit(1)).as("n_ref_dups"),
            max("est_jaccard").as("best_jaccard"))
        batch.select(col("doc_id").as("new_id"))
          .join(perNew, Seq("new_id"), "left")
          .select(col("new_id"),
            coalesce(col("n_ref_dups"), lit(0L)).as("n_ref_dups"),
            col("best_jaccard"),
            (coalesce(col("n_ref_dups"), lit(0L)) > 0).as("is_dup"))
          .write.mode("append").parquet(outDir.toString)
      }
      .start()
    try q.awaitTermination() finally q.stop()

    // Materialize the accumulated sink so the caller's temp directories
    // can be removed before returning (spec-scoped; at production scale
    // outDir IS the durable verdict table and stays).
    s.read.parquet(outDir.toString).orderBy("new_id").localCheckpoint()
  }
}
