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
}
