package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def log = Seq(
    (1L, 10L, "A"), // run 1
    (1L, 20L, "A"),
    (1L, 30L, "B"), // run 2
    (1L, 40L, "A"), // run 3 — A again: a NEW run, not merged with run 1
    (2L, 10L, "X")) // single-event key
    .toDF("k", "tie", "v")
    .withColumn("ts", timestamp_seconds(col("tie")))

  test("folds runs of equal values into half-open validity intervals") {
    val h = Scd2.history(log, "k", "ts", "tie", "v")
      .withColumn("from_s", unix_timestamp(col("valid_from")))
      .withColumn("to_s", unix_timestamp(col("valid_to")))
      .orderBy("k", "from_s").localCheckpoint(true)
    val k1 = h.filter(col("k") === 1)
      .select("v", "from_s", "to_s", "is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().toSeq
    assert(k1 === Seq(
      ("A", 10L, Some(30L), false),
      ("B", 30L, Some(40L), false),
      ("A", 40L, None, true)))
    val k2 = h.filter(col("k") === 2)
      .select("v", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k2 === Seq(("X", true)))
  }

  test("intervals tile each key's span: exactly one current, no overlap") {
    val h = Scd2.history(log, "k", "ts", "tie", "v").localCheckpoint(true)
    assert(h.filter(col("is_current")).groupBy("k").count()
      .filter(col("count") =!= 1).count() === 0)
    // each non-current interval's valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("valid_from")
    assert(h.withColumn("_next", lead(col("valid_from"), 1).over(w))
      .filter(col("_next").isNotNull && col("valid_to") =!= col("_next"))
      .count() === 0)
  }

  test("a null timestamp sorting first does not split its successor's run") {
    val d = Seq((1L, 1L, None, "A"), (1L, 2L, Some(10L), "A"),
      (1L, 3L, Some(20L), "B"))
      .toDF("k", "tie", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val h = Scd2.history(d, "k", "ts", "tie", "v").localCheckpoint(true)
    assert(h.count() === 2, "one A run (null-ts row + ts=10), one B run")
    assert(h.filter(col("v") === "A").count() === 1)
  }

  test("null values form runs of their own (null-safe change test)") {
    val d = Seq((1L, 1L, Some("A")), (1L, 2L, None), (1L, 3L, None),
      (1L, 4L, Some("A")))
      .toDF("k", "tie", "v")
      .withColumn("ts", timestamp_seconds(col("tie")))
    val h = Scd2.history(d, "k", "ts", "tie", "v")
    assert(h.count() === 3, "A, null-run, A")
  }
}
