package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the unglamorous operator every long-lived
  * 100 TB table needs: streaming sinks, partitioned upserts, and
  * per-micro-batch writes leave directories with thousands of KB-sized
  * parquet files, and every downstream scan then pays one task + one
  * footer read per file. Compaction rewrites the directory into
  * ⌈totalBytes / targetFileBytes⌉ files in ONE round-robin shuffle —
  * no sort, no skew sensitivity — preserving rows exactly (asserted in
  * `CompactionSpec` and hash-checked end-to-end by `s16_compaction`).
  *
  * File sizes come from the driver-side FileSystem listing (cheap
  * metadata, no data read) rather than a scan, so planning cost is
  * O(files). At cluster scale the same code runs against HDFS/S3 paths —
  * the FileSystem abstraction is the point of going through Hadoop's API.
  *
  * NOTE: the rewrite reads recursively but writes FLAT — a hive-
  * partitioned layout (`key=.../part-*.parquet`) comes back as ordinary
  * columns, not directories. Compact a partitioned table one leaf
  * directory at a time to preserve its layout.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Rewrite `inPath`'s parquet files into `outPath` with ~`targetBytes`
    * per output file. Returns (filesBefore, filesAfter, totalBytes).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): Stats =
    compactClustered(spark, inPath, outPath, targetBytes,
      (df, n) => df.repartition(n))

  /** Compaction that ALSO restores a clustering layout (s29): the sized
    * rewrite routes through the caller's `cluster(df, n)` instead of a
    * round-robin shuffle — pass a [[ZOrder.layout]] (or a
    * repartitionByRange sort) and the compacted table comes out
    * BETTER-pruned, not just bigger-filed. Churn (streaming appends,
    * micro-batch upserts) destroys BOTH properties of a well-laid-out
    * table — file size AND clustering — and a compaction that fixes only
    * the first leaves every post-churn scan reading all files; the same
    * single shuffle pays for both (a range shuffle costs what the
    * round-robin did). File sizing is identical to [[compact]];
    * `cluster` receives the computed file count as its partition count.
    */
  def compactClustered(spark: SparkSession, inPath: String, outPath: String,
                       targetBytes: Long,
                       cluster: (DataFrame, Int) => DataFrame): Stats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val p = new Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: spark.read.parquet descends into nested dirs, so the
    // sizing pass must see the same files or a partitioned layout would
    // plan n=1 and collapse the table into a single task
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val st = it.next()
        if (!st.getPath.getName.startsWith("_")) buf += st
      }
      buf.toArray
    }
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    cluster(spark.read.parquet(inPath), n)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new Path(outPath)).count { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    Stats(files.length, after, totalBytes)
  }
}
