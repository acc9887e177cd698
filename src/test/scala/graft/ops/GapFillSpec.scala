package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {

  import spark.implicits._

  private def series = Seq(
    (1L, "2024-01-01", 5L),
    (1L, "2024-01-04", 7L),
    (2L, "2024-01-02", 1L))
    .toDF("k", "day", "v")
    .withColumn("day", col("day").cast("date"))

  test("densifies each key's span and forward-fills values") {
    val out = GapFill.daily(series, "k", "day", "v")
      .orderBy("k", "day").localCheckpoint(true)
    // key 1 spans 4 days, key 2 spans 1
    assert(out.count() === 5)
    val k1 = out.filter(col("k") === 1)
      .select(date_format(col("day"), "yyyy-MM-dd"), col("v"), col("filled"))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(k1 === Seq(
      ("2024-01-01", 5L, false),
      ("2024-01-02", 5L, true),   // densified, carries the 01-01 value
      ("2024-01-03", 5L, true),
      ("2024-01-04", 7L, false)))
    val k2 = out.filter(col("k") === 2)
      .select(col("filled")).as[Boolean].collect().toSeq
    assert(k2 === Seq(false), "single-day keys gain no rows")
  }

  test("no gaps: output days are consecutive per key") {
    val out = GapFill.daily(series, "k", "day", "v")
    val gaps = out
      .withColumn("_prev", lag(col("day"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("day")))
      .filter(col("_prev").isNotNull &&
        datediff(col("day"), col("_prev")) =!= 1)
    assert(gaps.count() === 0)
  }
}
