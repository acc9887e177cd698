package graft.streaming

import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming vector ingest: route arriving embeddings into a batch-
  * trained ANN index without stopping the stream — the online half of an
  * embedding pipeline (the batch half trains the coarse quantizer; the
  * stream assigns each new vector to its inverted list on arrival, so
  * index appends are a partitioned write, not a retrain).
  *
  * The assignment is a stateless per-row scalar expression over
  * plan-time literal centroids ([[Similarity.assignToLiteralCentroids]])
  * — no streaming aggregation, no state store, append mode. That is the
  * same explode-groupBy→per-row rewrite that made the t12 MinHash
  * signature build stream-safe. At 1000-executor scale the centroid
  * literals ship once inside the plan; per-row cost is nlist exact dot
  * products.
  */
object VectorIngest {

  /** Streaming source over the embeddings parquet (same one-element-glob
    * trick as [[EventStream.readEvents]]). Schema from a batch probe of
    * the same file ([[graft.Tables.physicalSchema]]), not hard-coded.
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(graft.Tables.physicalSchema(spark, dir, "embeddings"))
      .option("basePath", dir)
      .parquet(s"$dir/{embeddings.parquet}")

  /** Assign each arriving vector to its inverted list. Works on a
    * streaming OR batch frame (the expression is stateless); null and
    * zero-norm vectors are dropped, mirroring the batch index builders.
    */
  def assignStream(vectors: DataFrame, centroids: Seq[(Long, Seq[Double])],
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol), Similarity.quantized(col(vecCol)).as("_qv"))
      .filter(Similarity.dot(col("_qv"), col("_qv")) > 0)
      .select(col(idCol),
        Similarity.assignToLiteralCentroids(col("_qv"), centroids).as("cluster"))

  /** The corpus store a maintained stream grows: batch-id-keyed
    * subdirectories under `$corpusDir/embeddings.parquet`, read back
    * recursively as one table. Per-batch OVERWRITE into its own subdir
    * makes the corpus write idempotent under checkpoint replay — the
    * foreachBatch exactly-once discipline (t9's versioned upsert, applied
    * to an append-only corpus).
    */
  def readCorpusStore(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$corpusDir/embeddings.parquet")

  /** Streaming INDEX MAINTENANCE — the online half completed: each
    * micro-batch of embeddings is (1) written into the corpus store
    * (idempotent, batch-keyed) and (2) merged into the persisted IVF-PQ
    * index for `corpusDir` via [[Similarity.maintainIvfPq]] — an
    * O(batch) frozen-model append per trigger until the accumulated
    * delta share trips the staged full retrain (the first batch over an
    * empty index IS that retrain). Runs with AvailableNow and returns
    * after the drain; the serving path is [[Similarity.loadIvfPq]] on
    * the maintained index, fully decoupled from the stream.
    *
    * Crash/replay: a replayed batch overwrites its own corpus subdir
    * (no duplicate vectors); the index side either serves the completed
    * merge (stamp match) or — because the overwrite touched the store's
    * mtime or a `_pending_delta` marker survived — falls through to the
    * full retrain. Never a double-append, never a half-merged serve.
    */
  def maintainIndexStream(vectors: DataFrame, corpusDir: String,
                          checkpoint: String,
                          nlist: Int = 16, m: Int = 4, ksub: Int = 16,
                          iters: Int = 2, maxDeltaFraction: Double = 0.2,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): Unit = {
    val q = vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch.write.mode("overwrite")
            .parquet(s"$corpusDir/embeddings.parquet/b$batchId")
          Similarity.maintainIvfPq(s, corpusDir, batch.toDF(),
            readCorpusStore(s, corpusDir), nlist, m, ksub, iters,
            maxDeltaFraction, idCol, vecCol)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming DELETE feed (t39) — the erasure half of the lifecycle:
    * each micro-batch of retraction requests appends to the persisted
    * index's tombstone log ([[Similarity.tombstoneIds]]); every probe
    * through [[Similarity.loadIvfPq]] from that moment on subtracts the
    * ids before a candidate can form, and the next maintenance call
    * counts them toward the compacting-retrain trigger.
    *
    * Exactly-once here needs NO batch keying — the OTHER idempotency
    * discipline from [[IndexedIngestDedup]]'s keyed overwrites: the log
    * is idempotent BY VALUE (reads collapse duplicates in a distinct),
    * so a crash-replayed batch that re-appends the same ids changes
    * nothing observable. The two patterns are the two ways foreachBatch
    * side effects survive replay: value-idempotent appends when the
    * payload is a SET, batch-keyed overwrites when it is not
    * (IvfTombstoneSpec pins the replay case).
    */
  def deleteStream(requests: DataFrame, indexPath: String,
                   checkpoint: String, idCol: String = "vec_id"): Unit = {
    val q = requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        if (!batch.isEmpty)
          Similarity.tombstoneIds(batch.sparkSession, indexPath,
            batch.toDF(), idCol)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
