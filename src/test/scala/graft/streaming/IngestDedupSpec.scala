package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IngestDedupSpec extends SparkSpec {

  import spark.implicits._

  test("candidate pairs emit across micro-batches from bucket state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDS().toDF("doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again and again with many shared shingles in a row"
    val cands = IngestDedup.candidatePairs(docs, n = 3, numHashes = 64, bands = 32)
    val q = cands.toDF("id1", "id2").writeStream
      .format("memory").queryName("t12spec").outputMode("append").start()
    try {
      // batch 1: a lone document — nothing to pair with
      mem.addData((1L, base))
      q.processAllAvailable()
      assert(spark.table("t12spec").count() === 0, "no pair before the second doc")

      // batch 2: a near-dup arrives LATER — the pair must come from state
      mem.addData((2L, base + " tail"), (3L, "entirely different content " +
        "with nothing shared at all beyond plain words"))
      q.processAllAvailable()
      val pairs = spark.table("t12spec").select("id1", "id2")
        .distinct().as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)),
        s"cross-batch near-dup pair missing from $pairs")
      assert(pairs.count(p => p._1 == 3L || p._2 == 3L) <= 2,
        "unrelated doc should rarely bucket-collide")
    } finally q.stop()
  }

  test("pairs within one micro-batch are also emitted, exactly once per bucket") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDS().toDF("doc_id", "text")
    val base = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val cands = IngestDedup.candidatePairs(docs, n = 3, numHashes = 64, bands = 32)
    val q = cands.toDF("id1", "id2").writeStream
      .format("memory").queryName("t12spec2").outputMode("append").start()
    try {
      mem.addData((10L, base), (11L, base), (12L, base))
      q.processAllAvailable()
      val pairs = spark.table("t12spec2").select("id1", "id2")
        .distinct().as[(Long, Long)].collect().toSet
      assert(pairs === Set((10L, 11L), (10L, 12L), (11L, 12L)),
        s"same-batch trio must yield all three pairs: $pairs")
      // re-arrival of a known id must not re-pair it with itself
      mem.addData((10L, base))
      q.processAllAvailable()
      val again = spark.table("t12spec2").select("id1", "id2")
        .distinct().as[(Long, Long)].collect().toSet
      assert(again === pairs, "replayed id must not create new pairs")
    } finally q.stop()
  }
}
