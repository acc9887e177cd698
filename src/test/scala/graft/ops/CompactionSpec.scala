package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction: fewer files out than in, rows preserved exactly. */
class CompactionSpec extends SparkSpec {

  test("compacts many small files into few, content-exact") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    val df = (0 until 1000).map(i => (i.toLong, s"row$i", i % 7)).toDF("id", "s", "k")
    df.repartition(16).write.mode("overwrite").parquet(in)

    val stats = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(stats.filesBefore == 16)
    assert(stats.filesAfter == 1) // everything fits one 1 GiB target
    assert(stats.bytes > 0)

    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("respects the target size for multi-file output") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_compact_in2").toString
    val out = Files.createTempDirectory("graft_compact_out2").toString
    (0 until 5000).map(i => (i.toLong, "x" * 100)).toDF("id", "pad")
      .repartition(32).write.mode("overwrite").parquet(in)

    // pick a target ~1/3 of the total so the plan must use several files
    val p = new org.apache.hadoop.fs.Path(in)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val stats = Compaction.compact(spark, in, out, targetBytes = total / 3 + 1)
    assert(stats.filesAfter == 3)
    assert(spark.read.parquet(out).count() == 5000)
  }

  test("rejects non-positive target") {
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, "/tmp/nope", "/tmp/nope2", targetBytes = 0)
    }
  }
}
