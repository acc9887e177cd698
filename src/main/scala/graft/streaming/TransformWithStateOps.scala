package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Arbitrary stateful streaming on Spark 4's `transformWithState` API —
  * the successor to `flatMapGroupsWithState` (t5/t16) with COMPOSABLE
  * state: multiple named state variables per key (here a ValueState
  * running aggregate plus a MapState per-event-type counter), explicit
  * event-time timers (register/delete, not one implicit timeout slot),
  * and TTL support. Requires the RocksDB state store provider
  * ([[EventStream.statefulSession]] sets it), which is also the
  * production cluster backend — state spills to disk instead of
  * living on-heap.
  *
  * The operator: a per-user milestone emitter + timer-flushed final
  * summary. Every `milestoneEvery`-th event of a user emits a running
  * snapshot from the DATA path (count, cents so far, distinct event
  * types so far); when a user goes quiet for `gapMinutes` of EVENT time
  * (watermark passes lastSeen + gap), the registered timer fires and
  * emits one `final` row, then clears BOTH state variables. Users whose
  * timer the final watermark never passes emit no final row — the t16
  * eviction discipline, replayed exactly by the oracle in floored-ms
  * integer arithmetic.
  *
  * Mirrors the reference's crawl-freshness bookkeeping
  * (`crawl.py:678`, `crawl.py:725`: act when `last_crawl` is older
  * than a cutoff) as first-class streaming state instead of a polled
  * timestamp column.
  *
  * Determinism contract (same as t5/t16): each micro-batch's rows are
  * sorted by (us, event_id) before folding, and the single-file source
  * delivers one batch, so the fold order equals the oracle's global
  * (us, event_id) order. Across batches the watermark bounds disorder.
  *
  * Timer-firing boundary, measured by `TwsBoundarySpec` with crafted
  * ±1 ms events: a timer registered at T ms fires iff
  * `T <= watermark` — NON-strict, where the final watermark is
  * `(max_us // 1000) − delay_ms`. Note this is the OPPOSITE boundary
  * from the flatMapGroupsWithState timeout, which fires on strict `<`
  * (t16) — the two stateful APIs genuinely disagree at the equality
  * millisecond, so porting a pipeline between them shifts rows whose
  * timer lands exactly on a watermark.
  */
object TransformWithStateOps {

  /** One input event, pre-projected: integer µs + exact cents. `ts` rides
    * along because the event-time column must survive into the stateful
    * operator for watermark tracking.
    */
  final case class TwsEvent(user_id: Long, event_id: Long, us: Long,
                            event_type: String, cents: Long,
                            ts: java.sql.Timestamp)

  /** Output row: kind ∈ {milestone, final}. */
  final case class TwsOut(user_id: Long, kind: String, n: Long,
                          cents: Long, n_types: Long)

  /** ValueState payload: running totals + the currently registered timer
    * (so a later batch can delete-and-re-register instead of leaking a
    * second timer that would double-emit the final row).
    */
  final case class TwsAgg(n: Long, cents: Long, nTypes: Long,
                          lastUs: Long, timerMs: Long)

  /** The StatefulProcessor. State: `agg` (ValueState[TwsAgg]) and
    * `types` (MapState[String, Long] — per-event-type counts; its key
    * set is the distinct-type count surfaced as `n_types`).
    */
  final class MilestoneProcessor(gapMs: Long, milestoneEvery: Int)
      extends StatefulProcessor[Long, TwsEvent, TwsOut] {
    @transient private var agg: ValueState[TwsAgg] = _
    @transient private var types: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[TwsAgg]("agg", Encoders.product[TwsAgg],
        TTLConfig.NONE)
      types = getHandle.getMapState[String, Long]("types", Encoders.STRING,
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[TwsEvent],
                                 timerValues: TimerValues): Iterator[TwsOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TwsOut]
      var st =
        if (agg.exists()) agg.get()
        else TwsAgg(0L, 0L, 0L, Long.MinValue, Long.MinValue)
      for (e <- rows.toArray.sortBy(r => (r.us, r.event_id))) {
        val newType = !types.containsKey(e.event_type)
        types.updateValue(e.event_type,
          (if (newType) 0L else types.getValue(e.event_type)) + 1L)
        st = TwsAgg(st.n + 1, st.cents + e.cents,
          st.nTypes + (if (newType) 1L else 0L),
          math.max(st.lastUs, e.us), st.timerMs)
        if (st.n % milestoneEvery == 0)
          out += TwsOut(user, "milestone", st.n, st.cents, st.nTypes)
      }
      // one live timer per key: delete the stale one before re-arming.
      // Guarded on n > 0 so a degenerate empty-input invocation can
      // neither arm a timer off the Long.MinValue sentinel nor store
      // state that would later emit a final row with n = 0.
      if (st.n > 0) {
        if (st.timerMs != Long.MinValue) getHandle.deleteTimer(st.timerMs)
        val timerMs = st.lastUs / 1000 + gapMs // floor-µs→ms, the engine's clock
        getHandle.registerTimer(timerMs)
        agg.update(st.copy(timerMs = timerMs))
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsOut] = {
      if (!agg.exists()) Iterator.empty
      else {
        val st = agg.get()
        agg.clear()
        types.clear()
        Iterator.single(TwsOut(user, "final", st.n, st.cents, st.nTypes))
      }
    }
  }

  /** [[TtlCounterProcessor]] output: the running totals at the end of
    * each micro-batch the user appeared in (since the last TTL expiry).
    */
  final case class TwsTtlOut(user_id: Long, n: Long, n_types: Long)

  /** The TTL surface of the API (t24): a per-user running event counter
    * (ValueState[Long]) plus distinct-type map (MapState) where BOTH
    * state variables carry a real `TTLConfig(ttl)` instead of
    * `TTLConfig.NONE` — state that goes unrefreshed for `ttl` of
    * PROCESSING time is expired by the store and the counts restart,
    * the bounded-state mechanism a production pipeline relies on so an
    * abandoned key cannot hold RocksDB space forever. TTL forces
    * `TimeMode.ProcessingTime` (the handle throws
    * `cannotProvideTTLConfigForTimeMode` otherwise — verified in
    * TwsTtlSpec), so unlike t21 there are no event-time timers and no
    * watermark: each batch a user appears in emits one row with the
    * running totals.
    *
    * Determinism contract: counts and distinct-type counts are
    * fold-order-free, so no per-batch sort is needed. The t24 oracle
    * holds under single-batch delivery (readEvents' single-file source)
    * with `ttl` far above any plausible batch duration: nothing expires,
    * and each user emits exactly one row of whole-corpus totals. Expiry
    * itself is wall-clock-dependent and is pinned by TwsTtlSpec's
    * sleep-past-TTL test instead of the oracle (the t13 discipline:
    * production path in the entry, timing-dependent behavior in a spec).
    */
  final class TtlCounterProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, TwsEvent, TwsTtlOut] {
    @transient private var n: ValueState[Long] = _
    @transient private var types: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = TTLConfig(ttl)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, cfg)
      types = getHandle.getMapState[String, Long]("types", Encoders.STRING,
        Encoders.scalaLong, cfg)
    }

    override def handleInputRows(user: Long, rows: Iterator[TwsEvent],
                                 timerValues: TimerValues): Iterator[TwsTtlOut] = {
      // exists() is the expiry gate: an expired value reads as absent,
      // so the fold restarts from zero — no explicit expiry handling.
      var c = if (n.exists()) n.get() else 0L
      for (e <- rows) {
        c += 1L
        types.updateValue(e.event_type,
          (if (types.containsKey(e.event_type)) types.getValue(e.event_type)
           else 0L) + 1L)
      }
      n.update(c) // update refreshes the value's TTL clock
      // keys() filters expired entries, and the batch's own updateValue
      // calls re-armed every type seen this batch — the size is the
      // distinct-type count since the last expiry
      Iterator.single(TwsTtlOut(user, c, types.keys().size.toLong))
    }
  }

  /** Wire [[TtlCounterProcessor]] over a (possibly streaming) events
    * DataFrame. `TimeMode.ProcessingTime` is mandatory for TTL state.
    */
  def ttlCounter(events: DataFrame,
                 ttl: java.time.Duration): Dataset[TwsTtlOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    typedEvents(events)
      .groupByKey(_.user_id)
      .transformWithState(new TtlCounterProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** One consecutive-pattern match: the purchase (last pattern element)
    * event's id, emitted the moment it arrives.
    */
  final case class TwsMatch(user_id: Long, purchase_id: Long)

  // t22's processor IS [[PatternWithHistoryProcessor]] run with no
  // initial state (StatefulProcessorWithInitialState extends
  // StatefulProcessor) — one sliding-buffer implementation, so the two
  // entries cannot diverge.

  /** Per-key seed for [[PatternWithHistoryProcessor]]: the last
    * `pattern.size−1` event types from batch history, oldest first.
    */
  final case class TwsSeed(user_id: Long, buf: Seq[String])

  /** The consecutive-pattern matcher (t22 + t23): a per-key sliding
    * buffer of the last `pattern.size−1` event types lives in ListState
    * (the state type [[MilestoneProcessor]]'s ValueState + MapState
    * don't touch) across micro-batches, and a row emits from the data
    * path whenever the buffer + the arriving event spell the pattern
    * CONSECUTIVELY (stricter than w12's `A B+ C` subsequence match — no
    * other event may intervene). No timers, no watermark: state is
    * O(pattern) per key forever, eviction-free by construction.
    *
    * Implements the API's initial-state surface
    * (`StatefulProcessorWithInitialState`, t23): the buffer can be
    * SEEDED from batch history before the first micro-batch, so a
    * pattern straddling the history/stream boundary (view+click in the
    * warehouse, purchase arriving live) matches from the very first
    * streamed event — the reference's incremental-crawl posture
    * (`crawl.py:678` last_crawl watermarks) as first-class state
    * bootstrap instead of a rescan. Run without initial state it is
    * plain t22.
    */
  final class PatternWithHistoryProcessor(pattern: List[String])
      extends StatefulProcessorWithInitialState[Long, TwsEvent, TwsMatch, TwsSeed] {
    @transient private var buf: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[String]("buf", Encoders.STRING, TTLConfig.NONE)

    override def handleInitialState(user: Long, seed: TwsSeed,
                                    timerValues: TimerValues): Unit =
      if (seed.buf.nonEmpty) buf.put(seed.buf.toArray)

    override def handleInputRows(user: Long, rows: Iterator[TwsEvent],
                                 timerValues: TimerValues): Iterator[TwsMatch] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TwsMatch]
      var window = if (buf.exists()) buf.get().toList else Nil
      for (e <- rows.toArray.sortBy(r => (r.us, r.event_id))) {
        if (window == pattern.init && e.event_type == pattern.last)
          out += TwsMatch(user, e.event_id)
        window = (window :+ e.event_type).takeRight(pattern.length - 1)
      }
      buf.put(window.toArray)
      out.iterator
    }
  }

  /** Wire [[PatternWithHistoryProcessor]]: `history` is a BATCH events
    * frame whose per-user trailing types seed the buffer; `stream` is
    * the live side.
    */
  def consecutiveMatchesWithHistory(stream: DataFrame, history: DataFrame,
                                    pattern: List[String]): Dataset[TwsMatch] = {
    require(pattern.size >= 2, s"pattern needs >= 2 steps: $pattern")
    val spark = stream.sparkSession
    import spark.implicits._
    val m = pattern.size - 1
    // trailing ≤ m types. NOT slice(arr, -m, m): a negative start with
    // |start| > size returns the EMPTY array (measured on Spark 4.1.2),
    // which would silently drop the partial buffer of a user with fewer
    // than m history events — the positive-start form keeps it.
    val sorted = array_sort(collect_list(struct(
      unix_micros(col("ts")).as("us"), col("event_id").as("i"),
      col("event_type").as("t"))))
    val seeds = history
      .groupBy(col("user_id"))
      .agg(transform(
        slice(sorted, greatest(size(sorted) - (m - 1), lit(1)), lit(m)),
        x => x.getField("t")).as("buf"))
      .as[TwsSeed]
      .groupByKey(_.user_id)
    typedEvents(stream)
      .groupByKey(_.user_id)
      .transformWithState(new PatternWithHistoryProcessor(pattern),
        TimeMode.None(), OutputMode.Append(), seeds)
  }

  /** Wire the pattern matcher with no seed (plain t22). */
  def consecutiveMatches(events: DataFrame,
                         pattern: List[String]): Dataset[TwsMatch] = {
    require(pattern.size >= 2, s"pattern needs >= 2 steps: $pattern")
    val spark = events.sparkSession
    import spark.implicits._
    typedEvents(events)
      .groupByKey(_.user_id)
      .transformWithState(new PatternWithHistoryProcessor(pattern),
        TimeMode.None(), OutputMode.Append())
  }

  /** Wire [[MilestoneProcessor]] over a (possibly streaming) events
    * DataFrame.
    *
    * Delivery-sensitivity: the operator is a SESSION summarizer — a user
    * quiet for more than the gap between micro-batches emits an
    * intermediate final and restarts counts (pinned by TwsBoundarySpec's
    * multi-batch test). The t21 oracle models exactly one final per user
    * because its single-file source delivers everything in one batch;
    * any multi-file wiring of this operator changes the answer by
    * design, not by bug.
    */
  def milestoneSummary(events: DataFrame, gapMinutes: Int,
                       milestoneEvery: Int,
                       watermark: String = "1 hour"): Dataset[TwsOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    typedEvents(events.withWatermark("ts", watermark))
      .groupByKey(_.user_id)
      .transformWithState(
        new MilestoneProcessor(gapMinutes * 60L * 1000L, milestoneEvery),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The one events→[[TwsEvent]] projection all three wire paths share. */
  private def typedEvents(events: DataFrame): Dataset[TwsEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"),
        col("ts"))
      .as[TwsEvent]
  }
}
