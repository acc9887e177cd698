package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Cross-batch lifecycle of [[EventStream.sessionizeWithTimeout]] — the
  * t16 driver entry drains one micro-batch; this spec drives the state
  * machine across batches: a session must close (a) when a later batch
  * brings an event past the gap, and (b) when the watermark passes its
  * end + gap with NO further event — and an open session whose
  * end + gap the watermark has not passed must emit nothing.
  */
class SessionTimeoutSpec extends SparkSpec {

  test("sessions close by later-batch data and by watermark timeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp)]
    val base = 1700000000000L // ms
    def ts(offMin: Long) = new Timestamp(base + offMin * 60000L)

    val out = EventStream.sessionizeWithTimeout(
      mem.toDS().toDF("user_id", "ts"), gapMinutes = 240, watermark = "1 hour")
    val q = out.toDF().writeStream
      .format("memory").queryName("t16spec").outputMode("append").start()
    try {
      // batch 1: user 1 session A (2 events, 1 min apart)
      mem.addData((1L, ts(0)), (1L, ts(1)))
      q.processAllAvailable()
      assert(spark.table("t16spec").count() === 0,
        "open session must not emit")

      // batch 2: user 1 again 10h later — session A is now known-closed
      mem.addData((1L, ts(600)))
      q.processAllAvailable()
      val afterData = spark.table("t16spec")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(afterData === Set((1L, base * 1000L, (base + 60000L) * 1000L, 2L)),
        s"session A should close via the data path: $afterData")

      // batch 3: user 99 far ahead pushes the watermark past session B's
      // end + gap (wm = 30h - 1h = 29h > 10h + 4h) — B times out; user
      // 99's own session stays open (wm never passes ITS end + gap)
      mem.addData((99L, ts(1800)))
      q.processAllAvailable()
      val afterTimeout = spark.table("t16spec")
        .as[(Long, Long, Long, Long)].collect().toSet
      val sessB = (1L, (base + 600 * 60000L) * 1000L,
        (base + 600 * 60000L) * 1000L, 1L)
      assert(afterTimeout === afterData + sessB,
        s"session B should close via timeout, nothing else: $afterTimeout")
      assert(!afterTimeout.exists(_._1 == 99L), "user 99's session is open")
    } finally q.stop()
  }

  test("out-of-order cross-batch event merges by min/max, never regresses the end") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp)]
    val base = 1700000000000L
    def ts(offMin: Long) = new Timestamp(base + offMin * 60000L)

    val out = EventStream.sessionizeWithTimeout(
      mem.toDS().toDF("user_id", "ts"), gapMinutes = 240, watermark = "1 hour")
    val q = out.toDF().writeStream
      .format("memory").queryName("t16spec_ooo").outputMode("append").start()
    try {
      // batch 1: event at t+60 -> watermark becomes t+0
      mem.addData((1L, ts(60)))
      q.processAllAvailable()
      // batch 2: OUT-OF-ORDER event at t+30 — inside the watermark delay,
      // so it must merge (min start, max end), not move the end backwards
      mem.addData((1L, ts(30)))
      q.processAllAvailable()
      // batch 3: t+286 — 3h46 after the TRUE end (t+60), within the 4h
      // gap: still ONE session. (A regressed end of t+30 would read this
      // as a 4h16 gap and split, emitting an end < start session.)
      mem.addData((1L, ts(286)))
      q.processAllAvailable()
      assert(spark.table("t16spec_ooo").count() === 0,
        "nothing closed yet — a split here means the end regressed")
      // push the watermark far past end + gap -> the single merged
      // session times out
      mem.addData((99L, ts(2000)))
      q.processAllAvailable()
      val got = spark.table("t16spec_ooo")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = Set((1L, (base + 30 * 60000L) * 1000L,
        (base + 286 * 60000L) * 1000L, 3L))
      assert(got === want, s"expected one merged session: $got")
    } finally q.stop()
  }
}
