package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {

  import spark.implicits._

  // SCD2-shaped dim for key 1: A [10, 30), B [30, 50), C [50, open)
  private def dim = Seq(
    (1L, "A", Some(10L), Some(30L)),
    (1L, "B", Some(30L), Some(50L)),
    (1L, "C", Some(50L), None),
    (2L, "X", Some(100L), None))
    .toDF("k", "v", "_f", "_t")
    .select(col("k"), col("v"),
      timestamp_seconds(col("_f")).as("valid_from"),
      timestamp_seconds(col("_t")).as("valid_to"))

  private def facts = Seq(
    (1L, 10L), // run start is inclusive -> A
    (1L, 29L), // last instant of A
    (1L, 30L), // half-open: boundary belongs to B
    (1L, 99L), // open run -> C
    (1L, 5L),  // before first run -> dropped
    (2L, 100L),
    (3L, 50L)) // no dim key -> dropped
    .toDF("k", "_ts")
    .select(col("k"), timestamp_seconds(col("_ts")).as("ts"))

  test("each fact resolves to the run valid at its time, half-open bounds") {
    val got = TemporalJoin.pointInTime(facts, "k", "ts", dim, "k")
      .select(col("k"), unix_timestamp(col("ts")).as("sec"), col("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 10L, "A"), (1L, 29L, "A"), (1L, 30L, "B"), (1L, 99L, "C"),
      (2L, 100L, "X")))
  }

  test("a null valid_from run is open-ended backwards, not silently unmatched") {
    val d = Seq((1L, "A", None: Option[Long], Some(30L)), (1L, "B", Some(30L), None))
      .toDF("k", "v", "_f", "_t")
      .select(col("k"), col("v"),
        timestamp_seconds(col("_f")).as("valid_from"),
        timestamp_seconds(col("_t")).as("valid_to"))
    val f = Seq((1L, 5L), (1L, 29L), (1L, 30L)).toDF("k", "_ts")
      .select(col("k"), timestamp_seconds(col("_ts")).as("ts"))
    val got = TemporalJoin.pointInTime(f, "k", "ts", d, "k")
      .select(unix_timestamp(col("ts")).as("sec"), col("v"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((5L, "A"), (29L, "A"), (30L, "B")))
  }

  test("shared non-key column names are rejected, not silently ambiguous") {
    val d = dim.withColumnRenamed("v", "ts") // collides with facts.ts
    val ex = intercept[IllegalArgumentException] {
      TemporalJoin.pointInTime(facts, "k", "ts", d, "k")
    }
    assert(ex.getMessage.contains("share column name"))
  }

  test("plans as an equi-join on the key, not a nested loop") {
    val plan = TemporalJoin.pointInTime(facts, "k", "ts", dim, "k")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"degraded to a loop:\n$plan")
  }

  test("composes with Scd2.history: every fact inside the span matches exactly once") {
    val log = Seq((1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"))
      .toDF("k", "tie", "v")
      .withColumn("ts", timestamp_seconds(col("tie")))
    val d = Scd2.history(log, "k", "ts", "tie", "v")
    val f = (10L to 60L).map((1L, _)).toDF("k", "_ts")
      .select(col("k"), timestamp_seconds(col("_ts")).as("fts"))
    val joined = TemporalJoin.pointInTime(f, "k", "fts", d, "k")
      .localCheckpoint(true)
    assert(joined.count() === 51, "one match per fact, no gaps, no overlap")
    assert(joined.groupBy("fts").count().filter(col("count") =!= 1).count() === 0)
    assert(joined.filter(unix_timestamp(col("fts")) === 35).select("v")
      .as[String].head() === "B")
  }
}
