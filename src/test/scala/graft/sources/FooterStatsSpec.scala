package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The zone map against a REAL multi-file layout: write a table
  * range-clustered across files, harvest footers, and check that
  *   · the harvested stats equal the per-file truth,
  *   · the pruning consumer keeps exactly the files a range predicate
  *     can touch,
  *   · scanning only the surviving files loses no qualifying row
  *     (pruning is an optimization, never a filter).
  */
class FooterStatsSpec extends SparkSpec {

  import spark.implicits._

  test("range-clustered files prune to exactly the intersecting ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zm_").toString
    // 4 files, k clustered: file i holds k in [i*100, i*100+99]
    (0 until 4).foreach { i =>
      (i * 100 until i * 100 + 100).map(k => (k.toLong, k * 1.5))
        .toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part$i")
    }
    val files = (0 until 4).flatMap { i =>
      new java.io.File(s"$dir/part$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    }
    assert(files.size === 4)

    val zm = FooterStats.zoneMap(spark, files)
    // per-file truth: 100 values, no nulls, min/max of the range
    val kRows = zm.filter(col("column_name") === "k").collect()
    assert(kRows.length === 4)
    kRows.foreach { r =>
      assert(r.getAs[Long]("n_values") === 100L)
      assert(r.getAs[Long]("n_nulls") === 0L)
      assert(r.getAs[Double]("max_val") - r.getAs[Double]("min_val") === 99.0)
    }

    // predicate k in [150, 250] touches files 1 and 2 only
    val kept = FooterStats.pruneFiles(zm, "k", 150, 250)
      .as[String].collect().sorted
    val expected = files.map(f => new org.apache.hadoop.fs.Path(f).getName)
      .filter(n => {
        val owner = files.indexWhere(_.endsWith(n))
        owner == 1 || owner == 2
      }).sorted
    // file names are unique per part dir (random UUID part names)
    assert(kept.length === 2, s"kept=${kept.toSeq}")
    assert(kept.toSeq === expected.toSeq)

    // completeness: scanning only kept files + filter == full scan + filter
    val keptPaths = files.filter(f => kept.contains(new org.apache.hadoop.fs.Path(f).getName))
    val pruned = spark.read.parquet(keptPaths: _*)
      .filter(col("k").between(150, 250)).count()
    val full = spark.read.parquet(files: _*)
      .filter(col("k").between(150, 250)).count()
    assert(pruned === full)
    assert(full === 101L)
  }

  test("double columns harvest exact min/max; disjoint predicate prunes all") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zm2_").toString
    Seq((1L, 2.5), (2L, -3.25), (3L, 9.75)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val zm = FooterStats.zoneMap(spark, Seq(file))
    val v = zm.filter(col("column_name") === "v").collect().head
    assert(v.getAs[Double]("min_val") === -3.25)
    assert(v.getAs[Double]("max_val") === 9.75)
    assert(FooterStats.pruneFiles(zm, "v", 100.0, 200.0).count() === 0L)
  }
}
