package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks t21's `transformWithState` timer semantics with CRAFTED
  * timestamps sitting exactly ±1 ms around expiry (the
  * OuterJoinBoundarySpec discipline): a timer registered at T_ms fires
  * iff `T_ms <= watermark` — NON-strict, measured here, and NOT the
  * strict `<` that flatMapGroupsWithState timeouts use (t16). The two
  * stateful APIs disagree at the boundary; this spec is what pins the
  * difference (the sf gates only hit the boundary if some user's timer
  * lands exactly on the watermark millisecond). Also pins the
  * composable-state behavior the sf gates can't isolate: milestone rows
  * emit from the data path regardless of the watermark, and the final
  * row's `n_types` reads the MapState key set, not a stale counter.
  */
class TwsBoundarySpec extends SparkSpec {

  import spark.implicits._

  private val delayMs = 3600000L  // milestoneSummary's 1-hour watermark
  private val gapMs = 14400000L   // 4-hour quiet gap (gapMinutes = 240)
  private val T = 1705752000000L  // 2024-01-20 12:00:00 UTC — wm target

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tws_").toString
    rows.toDF("event_id", "ms", "user_id", "event_type", "value")
      .select(col("event_id"), expr("timestamp_millis(ms)").as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("timer fires on non-strict <=; milestones ignore the watermark; MapState counts types") {
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double)]
    // sentinel: max event time = T + delay, so the final watermark = T
    rows += ((900L, T + delayMs, 999L, "view", 0.0))
    // user 1: timer = last_ms + gap = T − 1 <= T → final EMITTED
    rows += ((1L, T - gapMs - 1, 1L, "click", 1.25))
    rows += ((2L, T - gapMs - 10, 1L, "purchase", 2.50))
    // user 2: timer = T exactly — <= T → final EMITTED (the non-strict
    // boundary; flatMapGroupsWithState would withhold this one)
    rows += ((3L, T - gapMs, 2L, "click", 9.99))
    // user 4: timer = T + 1, not <= T → final WITHHELD
    rows += ((4L, T - gapMs + 1, 4L, "view", 5.00))
    // user 3: 26 events well before T → one milestone at n=25 from the
    // data path (its own timer also fires: last + gap ≪ T)
    val types = Array("click", "view", "purchase")
    for (i <- 0 until 26)
      rows += ((100L + i, T - 2 * gapMs - 60000L * (26 - i), 3L,
        types(i % 3), 1.00))
    val dir = eventsDir(rows.result())

    val ss = EventStream.statefulSession(spark)
    val out = EventStream.runToMemory(
      TransformWithStateOps.milestoneSummary(
        EventStream.readEvents(ss, dir), gapMinutes = 240, milestoneEvery = 25)
        .toDF(),
      "tws_boundary", mode = "append")
      .select("user_id", "kind", "n", "cents", "n_types")
      .as[(Long, String, Long, Long, Long)].collect().toSet

    val finals = out.filter(_._2 == "final")
    assert(finals.map(_._1) === Set(1L, 2L, 3L),
      s"exactly the users whose timer is AT or past the watermark emit finals, got $finals")
    // user 1 final: 2 events, 125 + 250 cents, 2 distinct types (MapState)
    assert(finals.contains((1L, "final", 2L, 375L, 2L)), s"user-1 final drifted: $finals")
    // user 2: the exact-equality boundary row
    assert(finals.contains((2L, "final", 1L, 999L, 1L)), s"user-2 final drifted: $finals")
    // user 3 final: all 26 events, 3 types
    assert(finals.contains((3L, "final", 26L, 2600L, 3L)), s"user-3 final drifted: $finals")

    val milestones = out.filter(_._2 == "milestone")
    // only user 3 reaches 25 events; snapshot taken AT the 25th event
    assert(milestones === Set((3L, "milestone", 25L, 2500L, 3L)),
      s"milestone set drifted: $milestones")
  }

  test("multi-batch delivery: a mid-stream quiet gap SPLITS the user into two finals") {
    // Pins the session semantics the t21 oracle deliberately does NOT
    // model: t21's single-file source delivers everything in one batch,
    // so each user gets exactly one final. Under multi-batch delivery a
    // user quiet for > gap mid-stream emits an INTERMEDIATE final and
    // restarts counts from zero — the operator is a session summarizer,
    // and this spec is what surfaces a future source change loudly
    // instead of as an oracle mismatch (r6 advice).
    val t0 = T - 3 * gapMs
    def write(dir: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ms", "user_id", "event_type", "value")
        .select(col("event_id"), expr("timestamp_millis(ms)").as("ts"),
          col("user_id"), col("event_type"), col("value"), lit("").as("props"))
        .coalesce(1).write.parquet(dir)
    val root = java.nio.file.Files.createTempDirectory("graft_tws_mb_").toString
    // batch 1: user 7's first session (2 events, last = t0 → timer t0+gap)
    // + a sentinel raising max event time to t0+gap+delay, so batch 2's
    // watermark = t0+gap reaches the timer
    write(s"$root/b1", Seq(
      (1L, t0 - 10, 7L, "click", 1.00), (2L, t0, 7L, "view", 2.00),
      (900L, t0 + gapMs + delayMs, 999L, "view", 0.0)))
    // batch 2: sentinel only — user 7 has NO input, its expired timer
    // fires cleanly (no same-batch data/timer ordering in play)
    write(s"$root/b2", Seq((901L, t0 + gapMs + delayMs + 1, 998L, "view", 0.0)))
    // batch 3: user 7 returns after 2×gap of quiet (1 event at t0+2gap,
    // above batch 3's watermark t0+gap+ε — not late) + a sentinel pushing
    // the final watermark to t0+3gap ≥ the new timer t0+3gap
    write(s"$root/b3", Seq(
      (3L, t0 + 2 * gapMs, 7L, "purchase", 4.00),
      (902L, t0 + 3 * gapMs + delayMs, 997L, "view", 0.0)))
    EventStream.stampMtimeOrder(Seq(s"$root/b1", s"$root/b2", s"$root/b3"))

    val ss = EventStream.statefulSession(spark)
    val stream = graft.Tables.restoreTs(
      ss.readStream.schema(spark.read.parquet(s"$root/b1").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/b*"))
    val finals = EventStream.runToMemory(
      TransformWithStateOps.milestoneSummary(stream, gapMinutes = 240,
        milestoneEvery = 25).toDF(),
      "tws_multibatch", mode = "append")
      .filter(col("user_id") === 7 && col("kind") === "final")
      .select("user_id", "kind", "n", "cents", "n_types")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(finals === Set((7L, "final", 2L, 300L, 2L),
                          (7L, "final", 1L, 400L, 1L)),
      s"gap-split must emit one final per session with RESTARTED counts, got $finals")
  }
}
