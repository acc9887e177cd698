package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The e-family deletion lifecycle: tombstone appends are a logical
  * delete (deleted ids must never surface from any probe, immediately),
  * the churn trigger folds retraction in (heavy deletes force the
  * compacting retrain even on a source-fresh index), and the compaction
  * physically drops the ids while recall on the LIVE corpus holds.
  */
class IvfTombstoneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.t(spark, dir, "embeddings")

  test("IVF-PQ: tombstoned ids never surface, recall on the live corpus holds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tomb_pq_").toString
    val path = s"$tmp/idx"
    Similarity.saveIvfPq(Similarity.buildIvfPq(emb, nlist = 16, m = 8, ksub = 16), path)
    val queries = emb.filter(col("vec_id") % 25 === 0)

    // delete exactly the ids the index currently SERVES as top-1 — the
    // hardest set to suppress (every one is a guaranteed candidate)
    val before = Similarity.ivfpqQuery(
      Similarity.loadIvfPq(spark, path, emb), queries, k = 5, nprobe = 8)
    val doomed = before.filter(col("rank") === 1)
      .select(col("neighbor_id").as("vec_id")).distinct()
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    assert(doomedIds.nonEmpty)
    Similarity.tombstoneIds(spark, path, doomed)
    assert(Similarity.tombstoneCount(spark, path) === doomedIds.size.toLong)
    // idempotent: a retried delete batch collapses in the read-side distinct
    Similarity.tombstoneIds(spark, path, doomed)
    assert(Similarity.tombstoneCount(spark, path) === doomedIds.size.toLong)

    val after = Similarity.ivfpqQuery(
      Similarity.loadIvfPq(spark, path, emb), queries, k = 5, nprobe = 8)
    val served = after.select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(doomedIds).isEmpty,
      s"deleted ids surfaced: ${served.intersect(doomedIds)}")
    // every query still gets k results (the corpus is large enough) and
    // recall vs exact search over the LIVE corpus stays at rebuilt level
    assert(after.groupBy("query_id").count().filter(col("count") =!= 5).isEmpty)
    val live = emb.filter(!col("vec_id").isin(doomedIds.toSeq: _*))
    val exact = Similarity.bruteForceTopK(queries, live, k = 5)
    val tombRecall = Similarity.recallAtK(after, exact)
    val rebuilt = Similarity.ivfpqQuery(
      Similarity.buildIvfPq(live, nlist = 16, m = 8, ksub = 16),
      queries, k = 5, nprobe = 8)
    val rebuiltRecall = Similarity.recallAtK(rebuilt, exact)
    info(f"recall@5 tombstoned=$tombRecall%.3f rebuilt=$rebuiltRecall%.3f")
    assert(tombRecall >= rebuiltRecall - 0.1,
      f"tombstoned $tombRecall%.3f lags rebuilt $rebuiltRecall%.3f by > 0.1")
  }

  test("churn trigger: heavy deletes force the compacting retrain on a FRESH index") {
    // hermetic data dir: sourceStamp reads $dir/embeddings.parquet, and a
    // fresh dir per run keeps the shared index root from serving a prior
    // run's already-compacted index into this test's assertions
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_tomb_compact_").toString
    emb.write.mode("overwrite").parquet(s"$idxDir/embeddings.parquet")
    val corpus = spark.read.parquet(s"$idxDir/embeddings.parquet")
    // via loadOrBuild so the index is stamped FRESH for this exact corpus —
    // the case where the maintain short-circuit would otherwise never compact
    Similarity.loadOrBuildIvfPq(spark, idxDir, corpus, nlist = 16, m = 8,
      ksub = 16, iters = 2)
    val path = Similarity.ivfpqIndexPath(idxDir, 16, 8, 16, 2)
    import spark.implicits._
    val doomed = (0L until 150L).toDF("vec_id") // 150/500 = 30% > 20%
    Similarity.tombstoneIds(spark, path, doomed)

    val empty = corpus.filter(lit(false))
    val compacted = Similarity.maintainIvfPq(spark, idxDir, empty, corpus,
      nlist = 16, m = 8, ksub = 16, iters = 2, maxDeltaFraction = 0.2)
    // physically dropped: the log is consumed, the codes exclude the ids
    assert(Similarity.tombstoneCount(spark, path) === 0L,
      "compaction must consume the tombstone log")
    val codeIds = compacted.codes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(codeIds.forall(_ >= 150L), "compacted codes must exclude deleted ids")
    assert(codeIds.size === 350)
    // and a light delete on the fresh index does NOT trigger a rebuild:
    // the served index still excludes the id, but the log survives
    Similarity.tombstoneIds(spark, path, Seq(200L).toDF("vec_id"))
    val served = Similarity.maintainIvfPq(spark, idxDir, empty, corpus,
      nlist = 16, m = 8, ksub = 16, iters = 2, maxDeltaFraction = 0.2)
    assert(Similarity.tombstoneCount(spark, path) === 1L,
      "under-threshold delete must serve via anti-join, not rebuild")
    assert(served.codes.filter(col("cid") === 200L).isEmpty,
      "tombstoned id must not reach the served codes")
  }

  test("t39 delete stream: value-idempotent under crash replay, deletions served") {
    import graft.streaming.{EventStream, VectorIngest}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_t39_spec_").toString
    val path = s"$work/idx"
    Similarity.saveIvfPq(Similarity.buildIvfPq(emb, nlist = 16, m = 8, ksub = 16), path)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))

    // the ids the index currently serves as top-1 — guaranteed candidates
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val doomed = Similarity.ivfpqQuery(
        Similarity.loadIvfPq(spark, path, emb), queries, k = 5, nprobe = 8)
      .filter(col("rank") === 1)
      .select(col("neighbor_id").as("vec_id")).distinct()
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    EventStream.stageOneFile(doomed, s"$work/in", "d0.parquet")

    def drain(): Unit = {
      val requests = spark.readStream
        .schema(spark.read.parquet(s"$work/in").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
      VectorIngest.deleteStream(requests, path, s"$work/chk")
    }
    drain()
    assert(Similarity.tombstoneCount(spark, path) === doomedIds.size.toLong)

    // crash window: the append landed, the commit marker did not —
    // Spark replays batch 0. Value-idempotence must absorb the replay:
    // same distinct count, no batch keying anywhere.
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$work/chk/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$work/chk/commits/.0.crc"))
    drain()
    assert(Similarity.tombstoneCount(spark, path) === doomedIds.size.toLong,
      "a replayed delete batch must collapse in the value-idempotent log")

    val served = Similarity.ivfpqQuery(
        Similarity.loadIvfPq(spark, path, emb), queries, k = 5, nprobe = 8)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(doomedIds).isEmpty,
      s"streamed deletions surfaced: ${served.intersect(doomedIds)}")
  }

  test("IVF twin: tombstoned ids never surface from ivfQuery") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tomb_ivf_").toString
    val path = s"$tmp/idx"
    Similarity.saveIvf(Similarity.buildIvf(emb, nlist = 16), path)
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val before = Similarity.ivfQuery(
      Similarity.loadIvf(spark, path), emb, queries, k = 5, nprobe = 8)
    val doomed = before.filter(col("rank") === 1)
      .select(col("neighbor_id").as("vec_id")).distinct()
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    Similarity.tombstoneIds(spark, path, doomed)
    val after = Similarity.ivfQuery(
      Similarity.loadIvf(spark, path), emb, queries, k = 5, nprobe = 8)
    val served = after.select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(doomedIds).isEmpty,
      s"deleted ids surfaced from IVF: ${served.intersect(doomedIds)}")
    assert(after.groupBy("query_id").count().filter(col("count") =!= 5).isEmpty)
  }
}
