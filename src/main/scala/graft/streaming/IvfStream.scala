package graft.streaming

import graft.{Pipeline, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-maintained IVF index — the ingest-time posture of
  * [[graft.Pipeline.simAnnIvf]]'s inverted lists run as a Structured
  * Streaming pipeline (the ANN counterpart of [[DedupStream]]; the
  * reference exposes only batch queries, this arrangement is the 100 TB
  * ingest design this library adds):
  *
  *   - centroids are trained ONCE on the already-ingested half with the
  *     exact [[graft.Pipeline.trainIvfCentroids]] procedure (at
  *     production scale: trained on a sample, then frozen — appends
  *     never re-cluster, so the index stays consistent for readers);
  *   - the ingested half's assignments are written as the initial
  *     inverted-list table, PARTITIONED BY cluster id — the on-disk
  *     layout a probe reads one directory per probed list from;
  *   - new vectors arrive as parquet files in a watched directory,
  *     consumed with `Trigger.AvailableNow` + `maxFilesPerTrigger 1`;
  *     `foreachBatch` assigns each arrival with the same constant-folded
  *     map-side argmin (no corpus×k join, no state shuffle — the batch
  *     never touches existing index rows) and appends to the lists;
  *   - a probe search over the maintained index is then byte-identical
  *     to one over a batch-built index on the same centroids, which is
  *     what [[graft.StreamingSpec]] asserts.
  *
  * Returns the accumulated index (vec_id, cid) plus the frozen centroid
  * table so the spec can rebuild the batch twin. */
object IvfStream {

  /** Run the streaming IVF maintenance over `d`'s embeddings; `files`
    * controls how many arrival files (micro-batches) the new half is
    * split into. */
  def ivfAppendStream(s: SparkSession, d: String, files: Int = 4)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    val vecs = Q.t(s, d, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .localCheckpoint() // read for training, initial lists, and arrivals
    val cutRow = vecs.agg((max(col("vec_id")).cast("long") / 2).cast("long"))
      .head()
    require(!cutRow.isNullAt(0),
      "ivfAppendStream: embeddings table is empty — nothing to index")
    val cut = cutRow.getLong(0)
    val ref = vecs.filter(col("vec_id") <= cut)

    // Frozen coarse quantizer: trained on the ingested half only — the
    // sample-trained centroid table appends are assigned against.
    val cents = Pipeline.trainIvfCentroids(ref, k = 16, iters = 3)

    // Initial inverted lists: the ingested half, cluster-partitioned.
    val outDir = java.nio.file.Files.createTempDirectory("graft_ivf_idx")
    ref.withColumn("cid", Pipeline.ivfCidExpr(cents))
      .select(col("vec_id"), col("cid"))
      .write.partitionBy("cid").mode("overwrite").parquet(outDir.toString)

    // New half lands as `files` parquet files in a watched directory.
    val newVecs = vecs.filter(col("vec_id") > cut)
    val inDir = java.nio.file.Files.createTempDirectory("graft_ivf_in")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ivf_ck")
    newVecs.withColumn("f", pmod(col("vec_id"), lit(files)))
      .write.partitionBy("f").mode("overwrite").parquet(inDir.toString)

    val schema = newVecs.schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/f=*")

    try {
      val q = stream.writeStream
        .option("checkpointLocation", ckDir.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // per-batch: map-side argmin against the frozen centroids, append
          // into the cluster-partitioned lists — complete within the batch
          // because assignment depends on nothing but the vector itself
          batch.withColumn("cid", Pipeline.ivfCidExpr(cents))
            .select(col("vec_id"), col("cid"))
            .write.partitionBy("cid").mode("append").parquet(outDir.toString)
        }
        .start()
      try q.awaitTermination() finally q.stop()

      // Materialize the accumulated index so all three temp directories
      // can be removed before returning (the helper is spec-scoped; at
      // production scale outDir IS the durable index and stays).
      (s.read.parquet(outDir.toString)
        .select(col("vec_id"), col("cid").cast("long").as("cid"))
        .orderBy("vec_id").localCheckpoint(), cents)
    } finally {
      Seq(inDir, ckDir, outDir).foreach(deleteRecursively)
    }
  }

  private[streaming] def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
