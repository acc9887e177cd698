package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t22's ListState buffer must survive the micro-batch boundary: a
  * view→click→purchase triple SPLIT across two batches (view+click in
  * batch 0, purchase in batch 1) matches only if the sliding type
  * buffer was persisted and restored — a fresh buffer per batch would
  * silently miss every straddling match, and the single-file sf gates
  * never exercise that path. Also pins the CONSECUTIVE semantics: an
  * intervening event kills the match (unlike w12's subsequence funnel).
  */
class TwsListStateSpec extends SparkSpec {

  import spark.implicits._

  private def writeEpoch(dir: String,
                         rows: Seq[(Long, Long, Long, String)]): Unit =
    rows.toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_millis(ms)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("").as("props"))
      .coalesce(1).write.parquet(dir)

  test("triple straddling a micro-batch boundary matches; intervener kills it") {
    val work = java.nio.file.Files.createTempDirectory("graft_tws_ls_").toString
    val T = 1705752000000L
    // user 1: view,click in epoch 0 — purchase opens epoch 1 → MATCH
    // user 2: view,click in epoch 0 — signup intervenes in epoch 1
    //         before the purchase → NO match
    // user 3: whole triple inside epoch 1 → MATCH (baseline)
    writeEpoch(s"$work/in/d0", Seq(
      (1L, T, 1L, "view"), (2L, T + 1000, 1L, "click"),
      (10L, T, 2L, "view"), (11L, T + 1000, 2L, "click")))
    writeEpoch(s"$work/in/d1", Seq(
      (3L, T + 2000, 1L, "purchase"),
      (12L, T + 2000, 2L, "signup"), (13L, T + 3000, 2L, "purchase"),
      (20L, T + 2000, 3L, "view"), (21L, T + 3000, 3L, "click"),
      (22L, T + 4000, 3L, "purchase")))
    EventStream.stampMtimeOrder(Seq(s"$work/in/d0", s"$work/in/d1"))

    val ss = EventStream.statefulSession(spark)
    val stream = graft.Tables.restoreTs(
      ss.readStream
        .schema(spark.read.parquet(s"$work/in/d0").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in/d*"))
    val out = EventStream.runToMemory(
      TransformWithStateOps.consecutiveMatches(
        stream, List("view", "click", "purchase")).toDF(),
      "tws_liststate", mode = "append")
      .as[(Long, Long)].collect().toSet

    assert(out === Set((1L, 3L), (3L, 22L)),
      s"straddling triple must match via persisted ListState, intervener must not: $out")
  }

  test("RESTART from checkpoint: ListState survives a stopped-and-relaunched query") {
    // stricter than the micro-batch case: the first QUERY processes
    // view+click and STOPS; a brand-new query object resumes from the
    // same checkpoint and must recover the RocksDB buffer to match the
    // purchase — the cluster crash/upgrade path, not just batch flow.
    val work = java.nio.file.Files.createTempDirectory("graft_tws_rs_").toString
    val T = 1705752000000L
    writeEpoch(s"$work/in/d0", Seq(
      (1L, T, 1L, "view"), (2L, T + 1000, 1L, "click")))
    val ss = EventStream.statefulSession(spark)
    import org.apache.spark.sql.streaming.Trigger

    def launch(): Unit = {
      val stream = graft.Tables.restoreTs(
        ss.readStream
          .schema(spark.read.parquet(s"$work/in/d0").schema)
          .parquet(s"$work/in/*"))
      // memory sink can't recover a checkpoint; the file sink is the
      // durable restart-capable path a cluster actually uses
      val q = TransformWithStateOps.consecutiveMatches(
        stream, List("view", "click", "purchase")).toDF()
        .writeStream.format("parquet")
        .option("path", s"$work/out")
        .outputMode("append")
        .option("checkpointLocation", s"$work/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    launch() // query 1: consumes d0, buffers [view, click], stops
    writeEpoch(s"$work/in/d1", Seq((3L, T + 2000, 1L, "purchase")))
    EventStream.stampMtimeOrder(Seq(s"$work/in/d0", s"$work/in/d1"))
    launch() // query 2: fresh query object, same checkpoint — must recover

    import spark.implicits._
    val out = spark.read.parquet(s"$work/out")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 3L)),
      s"the triple completes only if state survived the restart: $out")
  }

  test("initial state seeds the buffer: history/stream-straddling triple matches") {
    val work = java.nio.file.Files.createTempDirectory("graft_tws_is_").toString
    val T = 1705752000000L
    import spark.implicits._
    // history (batch): user 1's view+click; user 2's view+signup
    // (broken); user 5 has only ONE history event — the partial seed
    // (slice with a negative start would drop it; measured Spark 4.1.2)
    val history = Seq(
      (1L, T, 1L, "view"), (2L, T + 1000, 1L, "click"),
      (10L, T, 2L, "view"), (11L, T + 1000, 2L, "signup"),
      (50L, T, 5L, "view"))
      .toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_millis(ms)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("").as("props"))
    // stream: purchases (+ user 5's click) — user 1 closes a triple;
    // user 5's triple completes only if the SHORT seed survived
    writeEpoch(s"$work/in/d0", Seq(
      (3L, T + 2000, 1L, "purchase"), (12L, T + 2000, 2L, "purchase"),
      (51L, T + 2000, 5L, "click"), (52L, T + 3000, 5L, "purchase")))

    val ss = EventStream.statefulSession(spark)
    val stream = graft.Tables.restoreTs(
      ss.readStream
        .schema(spark.read.parquet(s"$work/in/d0").schema)
        .parquet(s"$work/in/d0"))
    val out = EventStream.runToMemory(
      TransformWithStateOps.consecutiveMatchesWithHistory(
        stream, history, List("view", "click", "purchase")).toDF(),
      "tws_initial", mode = "append")
      .as[(Long, Long)].collect().toSet

    assert(out === Set((1L, 3L), (5L, 52L)),
      s"full AND partial (single-event) seeds must complete on the stream: $out")
  }
}
