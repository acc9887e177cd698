package graft.streaming

import graft.{SparkSpec, Tables}
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class VectorIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.t(spark, dir, "embeddings")

  test("streamed literal-centroid assignment equals the batch relational argmax") {
    val centroids = Similarity.trainCentroidLiterals(emb)
    assert(centroids.size === 16)
    val streamed = EventStream.runToMemory(
      VectorIngest.assignStream(VectorIngest.readEmbeddings(spark, dir), centroids),
      "vi_spec_stream", mode = "append")
    val batch = Similarity.clusterAssignments(emb, centroids)
    assert(streamed.count() === emb.filter(col("embedding").isNotNull).count())
    // bit-identical labels: same cosine, same (score, −label) tie-break,
    // same NaN pinning on both paths
    val diff = streamed.join(batch.withColumnRenamed("cluster", "b_cluster"), "vec_id")
      .filter(col("cluster") =!= col("b_cluster"))
    assert(diff.count() === 0)
  }

  test("degenerate vectors are dropped on ingest, not misrouted") {
    import spark.implicits._
    val centroids = Similarity.trainCentroidLiterals(emb)
    val dim = emb.selectExpr("size(embedding)").head.getInt(0)
    val bad = Seq(
      (-1L, null.asInstanceOf[Array[Float]]),
      (-2L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val out = VectorIngest.assignStream(bad, centroids) // batch frame: same expression
    assert(out.count() === 0)
  }
}
