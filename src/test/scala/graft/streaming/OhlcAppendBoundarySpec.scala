package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The t37b withhold boundary, measured not assumed: WHICH bars does an
  * APPEND-mode windowed aggregation hold back at a given watermark, and
  * WHEN do they flush? (The r10 entry cut both engine and oracle to bars
  * ≥ 2 h behind max ts "by construction"; this spec justifies that cut
  * with the actual boundary.) Findings pinned below:
  *
  *   · a bar flushes in the same drain as the batch that advanced the
  *     watermark past it — the trailing no-data micro-batch runs the
  *     eviction, so emission does NOT lag one batch the way t30's LATE
  *     FILTER does (different mechanisms, different lag);
  *   · the boundary is NON-STRICT: window end == watermark already
  *     flushes (same convention as transformWithState timers, opposite
  *     of flatMapGroupsWithState timeouts — the repo's third distinct
  *     boundary, worth pinning for that reason alone);
  *   · everything above the watermark is withheld INDEFINITELY — a
  *     stream that ends holds its open tail forever, which is why t37b
  *     must cut its oracle to watermark-closed bars: max ts − 1 h delay
  *     is the theoretical flush line, and the entry's 2 h cut leaves a
  *     full extra hour of margin below it.
  */
class OhlcAppendBoundarySpec extends SparkSpec {

  private val H = 3600L * 1000L // ms
  private val base = 1767225600000L // 2026-01-01 00:00:00 UTC, hour-aligned

  private def withBars(f: (MemoryStream[Timestamp], () => Set[Long],
                           org.apache.spark.sql.streaming.StreamingQuery) => Unit): Unit = {
    val ss = EventStream.statefulSession(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[Timestamp]
    val name = s"ohlc_wb_${java.util.UUID.randomUUID().toString.take(8)}"
    val bars = mem.toDS().toDF("ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(expr(s"(unix_millis(window.start) - ${base}L) div ${H}L").as("h"),
        col("n"))
    val q = bars.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def sinkHours(): Set[Long] =
      ss.table(name).select("h").as[Long].collect().toSet
    try f(mem, () => sinkHours(), q) finally q.stop()
  }

  private def ts(h: Long, offMin: Long) =
    new Timestamp(base + h * H + offMin * 60000L)

  test("append flushes exactly the bars at-or-below watermark, in the advancing drain") {
    withBars { (mem, sink, q) =>
      // batch 0: ticks in hours 0, 1, 2; max ts = h2:30 → wm = h1:30.
      // Bar 0 (end 1 h ≤ 1 h 30) flushes IN THIS DRAIN via the no-data
      // batch; bar 1 is withheld although its hour looks "complete" —
      // the engine cannot know hour 1 is done until the watermark says so.
      mem.addData(ts(0, 10), ts(0, 50), ts(1, 15), ts(2, 30))
      q.processAllAvailable()
      assert(sink() === Set(0L),
        "wm = 1h30: bar 0 must flush in the same drain, bars 1,2 withheld")
      // batch 1: one tick in hour 5 → wm = h4 → bars 1 (end 2 h) and
      // 2 (end 3 h) flush; bar 5 (end 6 h) is the new open tail.
      mem.addData(ts(5, 0))
      q.processAllAvailable()
      assert(sink() === Set(0L, 1L, 2L),
        "wm = 4h: bars 1 and 2 flush; bar 5 is withheld")
      // stream ends here: bar 5 never flushes — the open tail is withheld
      // indefinitely, the exact reason t37b cuts its oracle to
      // watermark-closed bars instead of comparing the full sink.
      assert(!sink().contains(5L))
    }
  }

  test("the flush boundary is NON-strict: window end == watermark emits") {
    withBars { (mem, sink, q) =>
      mem.addData(ts(0, 30))
      q.processAllAvailable()
      assert(sink() === Set.empty)
      // max ts exactly h2:00 → wm = exactly h1:00 = bar 0's window END
      mem.addData(ts(2, 0))
      q.processAllAvailable()
      assert(sink() === Set(0L),
        "end == watermark must already flush (non-strict boundary)")
    }
  }

  test("a bar one microsecond above the watermark is withheld") {
    withBars { (mem, sink, q) =>
      mem.addData(ts(1, 0)) // bar 1, end h2:00
      q.processAllAvailable()
      // max ts h2:59:59.999 → wm h1:59:59.999 — 1 ms short of bar 1's end
      mem.addData(new Timestamp(base + 3 * H - 1))
      q.processAllAvailable()
      assert(sink() === Set.empty,
        "wm 1 ms below the window end must withhold the bar")
      mem.addData(new Timestamp(base + 3 * H)) // wm reaches exactly h2:00
      q.processAllAvailable()
      assert(sink() === Set(1L))
    }
  }
}
