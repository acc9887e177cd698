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

  test("maintainIndexStream: first batch builds, second appends, grown corpus served") {
    val work = java.nio.file.Files.createTempDirectory("graft_vi_maint_").toString
    val corpusDir = s"$work/corpus"
    // base corpus pre-exists in the store; two delta files arrive as
    // separate micro-batches (maxFilesPerTrigger=1, mtime order)
    emb.filter(col("vec_id") < 300)
      .write.parquet(s"$corpusDir/embeddings.parquet/base")
    emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .coalesce(1).write.parquet(s"$work/in/d0")
    emb.filter(col("vec_id") >= 400)
      .coalesce(1).write.parquet(s"$work/in/d1")
    // distinct mtimes -> deterministic file order (no sleep needed)
    EventStream.stampMtimeOrder(Seq(s"$work/in/d0", s"$work/in/d1"))

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$work/in/d0").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/d*")
    VectorIngest.maintainIndexStream(stream, corpusDir, s"$work/chk",
      nlist = 16, m = 8, ksub = 16, maxDeltaFraction = 0.3)

    val grown = VectorIngest.readCorpusStore(spark, corpusDir)
    assert(grown.count() === 500L)
    val path = Similarity.ivfpqIndexPath(corpusDir, 16, 8, 16, 2)
    val idx = Similarity.loadIvfPq(spark, path, grown)
    assert(idx.codes.select("cid").distinct().count() === 500L)
    // batch 0 found no index -> full build on base+d0 (n_base = 400);
    // batch 1's share 100/400 = 0.25 <= 0.3 -> frozen-model append
    assert(math.abs(Similarity.ivfpqDeltaFraction(spark, path) - 0.25) < 1e-9)
    // the maintained index serves the WHOLE grown corpus at the recall of
    // a from-scratch rebuild
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(queries, grown, k = 5)
    val maintained = Similarity.recallAtK(
      Similarity.ivfpqQuery(idx, queries, k = 5, nprobe = 8), exact)
    val rebuilt = Similarity.recallAtK(
      Similarity.ivfpqQuery(
        Similarity.buildIvfPq(grown, nlist = 16, m = 8, ksub = 16),
        queries, k = 5, nprobe = 8), exact)
    info(f"recall@5 maintained=$maintained%.3f rebuilt=$rebuilt%.3f")
    assert(maintained >= rebuilt - 0.1,
      f"maintained $maintained%.3f lags rebuilt $rebuilt%.3f by > 0.1")
  }
}
