package graft

import org.apache.spark.sql.functions._

/** s22's single-scan contract: observe() metrics are collected by an
  * accumulator riding the existing pass — the physical plan contains
  * exactly ONE scan of the source (a naive metrics implementation would
  * aggregate in a second read), and the observed values equal what a
  * dedicated aggregation computes.
  */
class ObservationSpec extends SparkSpec {

  import spark.implicits._

  test("observed metrics equal a dedicated aggregation, from ONE scan") {
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft_obs_").toString
    df.write.mode("overwrite").parquet(tmp)
    val src = spark.read.parquet(tmp)
    val obs = org.apache.spark.sql.Observation("obs_spec")
    val work = src.filter(col("v") =!= 3)
      .observe(obs, count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select("id")
    // exactly one scan of the parquet source in the physical plan
    val scans = work.queryExecution.executedPlan.collectLeaves()
      .count(_.toString.contains("Scan parquet"))
    assert(scans === 1, s"observe must ride the single existing scan: $scans")
    val written = java.nio.file.Files.createTempDirectory("graft_obs_out_").toString
    work.write.mode("overwrite").parquet(written)
    val m = obs.get
    val expected = src.filter(col("v") =!= 3)
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(m("n") === expected.getLong(0) && m("sv") === expected.getLong(1),
      s"observed $m vs dedicated ${expected}")
  }
}
