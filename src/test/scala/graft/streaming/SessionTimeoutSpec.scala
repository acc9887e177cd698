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
}
