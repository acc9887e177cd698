package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Pins the TTL semantics behind t24 — the one transformWithState
  * surface the sf gates cannot exercise, because expiry runs on
  * PROCESSING time (wall clock), not event time. Three facts measured
  * here, each load-bearing for the entry's oracle contract:
  *
  *   1. state that sleeps past its TTL between micro-batches reads as
  *      ABSENT in the next batch — the counter restarts and the MapState
  *      forgets its key set (both state types expire);
  *   2. state refreshed within its TTL survives across batches — the
  *      running totals accumulate (the t24 entry's 1-hour TTL over a
  *      single batch can therefore never expire, which is what makes its
  *      whole-corpus-totals oracle deterministic);
  *   3. a TTL on any state variable is REJECTED outside
  *      TimeMode.ProcessingTime — the event-time wiring t21 uses cannot
  *      carry TTL state, so the two entries genuinely cover different
  *      API surfaces.
  *
  * Timing margins are deliberately coarse (sleep 4 s past a 1.5 s TTL;
  * survival side uses a 10-minute TTL), the opposite of the ±1 ms
  * event-time discipline in TwsBoundarySpec: wall-clock boundaries
  * cannot be crafted exactly, so each side sits far from the boundary
  * instead.
  */
class TwsTtlSpec extends SparkSpec {

  private val base = 1700000000000L // ms; event time is irrelevant to TTL

  private def runBatches(ttl: java.time.Duration, name: String,
                         sleepMs: Long): Set[(Long, Long, Long)] = {
    // ttlSession, not statefulSession: ProcessingTime TTL state answers
    // shouldRunAnotherBatch = true forever, so with no-data batches
    // enabled processAllAvailable never returns (see EventStream.ttlSession)
    val ss = EventStream.ttlSession(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    // (event_id, ts, user_id, event_type, value) — the raw events shape
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val out = TransformWithStateOps.ttlCounter(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value"),
      ttl)
    val q = out.toDF().writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: user 1 — click, click, view
      mem.addData((1L, new Timestamp(base), 1L, "click", 1.0),
        (2L, new Timestamp(base + 1), 1L, "click", 1.0),
        (3L, new Timestamp(base + 2), 1L, "view", 1.0))
      q.processAllAvailable()
      Thread.sleep(sleepMs)
      // batch 2: user 1 — purchase, purchase (a type batch 1 never saw,
      // so n_types tells expired MapState (1) from surviving (3))
      mem.addData((4L, new Timestamp(base + 3), 1L, "purchase", 1.0),
        (5L, new Timestamp(base + 4), 1L, "purchase", 1.0))
      q.processAllAvailable()
      ss.table(name).select("user_id", "n", "n_types")
        .as[(Long, Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("state sleeping past its TTL expires: counter restarts, MapState forgets") {
    val got = runBatches(java.time.Duration.ofMillis(1500), "tws_ttl_expire",
      sleepMs = 4000)
    assert(got === Set((1L, 3L, 2L), (1L, 2L, 1L)),
      s"batch 2 must see EXPIRED state (n restarts at 2, purchase the only " +
        s"live type): $got")
  }

  test("state refreshed within its TTL survives: totals accumulate") {
    val got = runBatches(java.time.Duration.ofMinutes(10), "tws_ttl_survive",
      sleepMs = 50)
    assert(got === Set((1L, 3L, 2L), (1L, 5L, 3L)),
      s"batch 2 must see LIVE state (n = 5, three types): $got")
  }

  test("TTL state is rejected outside TimeMode.ProcessingTime") {
    // ttlSession so that if Spark ever ALLOWED TTL+EventTime the test
    // would fail on the intercept instead of hanging in processAllAvailable
    val ss = EventStream.ttlSession(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.functions.{col, unix_micros, round}
    // same processor, EventTime wiring: the handle must throw
    // cannotProvideTTLConfigForTimeMode when init() asks for TTL state
    val typed = mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"),
        col("ts"))
      .as[TransformWithStateOps.TwsEvent]
    val out = typed.groupByKey(_.user_id)
      .transformWithState(
        new TransformWithStateOps.TtlCounterProcessor(
          java.time.Duration.ofSeconds(30)),
        TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF().writeStream
      .format("memory").queryName("tws_ttl_reject").outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        mem.addData((1L, new Timestamp(base), 1L, "click", 1.0))
        q.processAllAvailable()
      } finally q.stop()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("TTL")),
      s"expected a TTL-in-wrong-TimeMode failure, got: ${e.getMessage}")
  }
}
