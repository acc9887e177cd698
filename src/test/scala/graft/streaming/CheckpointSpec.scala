package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incremental ingest with checkpointed exactly-once semantics — the
  * Structured Streaming re-expression of the reference's `last_crawl`
  * watermark columns (SURVEY.md §2.9 T1/T2): each run processes only
  * files not yet recorded in the checkpoint, and a restart neither skips
  * nor double-counts.
  */
class CheckpointSpec extends SparkSpec {

  test("AvailableNow file stream resumes from checkpoint exactly-once") {
    import spark.implicits._
    val src = Files.createTempDirectory("chk_src_").toString
    val out = Files.createTempDirectory("chk_out_").toString
    val chk = Files.createTempDirectory("chk_state_").toString
    val schema = StructType(Seq(StructField("id", LongType)))

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    spark.range(0, 100).toDF("id").write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() === 100)

    // new arrivals only: the checkpoint must skip the first 100
    spark.range(100, 150).toDF("id").write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.length === 150, "restart must not skip or duplicate")
    assert(ids.toSeq === (0L until 150L))

    // an idle restart is a no-op
    runOnce()
    assert(spark.read.parquet(out).count() === 150)
  }

  test("foreachBatch materialized view merges across genuine micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = Files.createTempDirectory("mat_src_").toString
    val store = Files.createTempDirectory("mat_store_").toString
    // three files × maxFilesPerTrigger=1 → three micro-batches, so the
    // upsert path genuinely merges (a single batch would never exercise it)
    Seq((1L, "a", 10L), (1L, "b", 5L)).toDF("k", "g", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((1L, "a", 20L), (2L, "a", 7L)).toDF("k", "g", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((1L, "a", 30L), (2L, "b", 1L)).toDF("k", "g", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    val agg = ss.readStream
      .schema("k BIGINT, g STRING, v BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .groupBy("k", "g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val result = EventStream.materialize(agg, Seq("k", "g"), s"$store/root")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // final store == batch aggregation over all three files
    assert(result === Map(
      (1L, "a") -> ((3L, 60L)),
      (1L, "b") -> ((1L, 5L)),
      (2L, "a") -> ((1L, 7L)),
      (2L, "b") -> ((1L, 1L))))
    // the store went through >1 version (several micro-batches merged)
    val versions = new java.io.File(s"$store/root").listFiles()
      .map(_.getName).filter(_.startsWith("v"))
    assert(versions.length > 1, s"expected multiple store versions, got ${versions.toSeq}")
  }
}
