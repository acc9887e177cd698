package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Crafted-event boundary measurements for t11/t11b `session_window` —
  * the corpus gate can pass without ever landing an event on an exact
  * session edge, so the merge rule the oracles encode is pinned here at
  * ms precision. MEASURED results (which RECALIBRATED both oracles from
  * `>=`-split to strict `>`-split in r8):
  *
  *   · an event exactly AT the session end MERGES — adjacent
  *     [start, end) sessions join (ts <= prev_end merges); 1 ms past
  *     the end splits. Holds for the static form too (the t11 rule).
  *   · the session end is the RUNNING MAX of (ts + own gap): a
  *     long-gap event keeps the session alive for a later short-gap
  *     event even after the short default gap has lapsed;
  *   · same-timestamp events always co-session (shared interval start),
  *     so the oracle's ROWS-frame peer order cannot change any count.
  */
class DynamicSessionSpec extends SparkSpec {

  import spark.implicits._

  private val base = 1700000000000L // ms

  // gap: purchase 60 s, otherwise 15 s (seconds for µs-precise edges)
  private def sessions(events: Seq[(Long, Long, String)]): Map[Long, Long] =
    events.map { case (u, ms, tpe) => (u, new Timestamp(ms), tpe) }
      .toDF("user_id", "ts", "event_type")
      .groupBy(col("user_id"), session_window(col("ts"),
        when(col("event_type") === "purchase", "60 seconds")
          .otherwise("15 seconds")))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap

  test("MEASURED: an event exactly at the session end MERGES (adjacent sessions join); 1 ms past splits") {
    val got = sessions(Seq(
      (1L, base, "click"),              // session end = base + 15 s
      (1L, base + 15000, "click"),      // AT the edge -> MERGES (measured)
      (2L, base, "click"),
      (2L, base + 15001, "click")))     // 1 ms past the edge -> splits
    assert(got === Map(1L -> 1L, 2L -> 2L),
      s"adjacent [start, end) sessions merge (ts <= prev_end): $got")
  }

  test("MEASURED: the static form shares the closed merge boundary (t11 calibration)") {
    val got = Seq((1L, new Timestamp(base)), (1L, new Timestamp(base + 15000)),
      (2L, new Timestamp(base)), (2L, new Timestamp(base + 15001)))
      .toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "15 seconds"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L),
      s"static session_window merges at exactly ts == prev + gap: $got")
  }

  test("running max: a purchase extends the session past later defaults' reach") {
    val got = sessions(Seq(
      (1L, base, "purchase"),           // end = base + 60 s
      (1L, base + 20000, "click"),      // 20 s later: merges via purchase
      (1L, base + 40000, "click"),      // still under base + 60 s: merges
      // without the running max, this one sits 19 s after the previous
      // click (> 15 s default) and would wrongly start a new session
      (3L, base, "click"),
      (3L, base + 20000, "click")))     // 20 s > 15 s default -> splits
    assert(got === Map(1L -> 1L, 3L -> 2L),
      s"session end must be the running max of (ts + own gap): $got")
  }

  test("same-timestamp events always co-session regardless of gap mix") {
    val got = sessions(Seq(
      (1L, base, "click"), (1L, base, "purchase"), (1L, base, "click")))
    assert(got === Map(1L -> 1L), s"shared-start intervals merge: $got")
  }
}
