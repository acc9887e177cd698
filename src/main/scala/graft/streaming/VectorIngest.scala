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
}
