package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks the t17/t20 eviction boundaries with CRAFTED timestamps sitting
  * exactly ±1 ms around expiry — the sf gates exercise the boundary only
  * with whatever stamps the synthetic data happens to contain; this spec
  * makes the calibrated semantics (floored-ms watermark, strict `<`
  * eviction, min over the two FILTERED sides' maxima) fail loudly if the
  * engine or the join helpers ever drift.
  *
  * Construction: wm lands exactly on T (both sides carry a sentinel pair
  * at T + delay). A click expires iff click_ms + window < T; a purchase
  * (full-outer) expires iff purchase_ms < T. One event on each side of
  * each boundary.
  */
class OuterJoinBoundarySpec extends SparkSpec {

  import spark.implicits._

  private val delayMs = 3600000L // the helpers' 1-hour watermark
  private val windowMs = 600000L // 10-minute join window
  private val T = 1705752000000L // 2024-01-20 12:00:00 UTC — wm target

  /** (event_id, ms, user, type) rows → a tmp dir shaped like the
    * testdata (events.parquet), read back through the REAL stream reader.
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ojb_").toString
    rows.toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_millis(ms)").as("ts"),
        col("user_id"), col("event_type"), lit(0.0).as("value"),
        lit("").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private val rows = Seq(
    // sentinels: one matching pair at T + delay on BOTH sides, so each
    // filtered side's max is T + delay and wm = T exactly
    (900L, T + delayMs, 999L, "click"),
    (901L, T + delayMs, 999L, "purchase"),
    // clicks with no purchase: expiry = c + window vs T
    (1L, T - windowMs - 1, 1L, "click"), // expiry T−1 < T  → null EMITTED
    (2L, T - windowMs, 1L, "click"),     // expiry T, not < T → withheld
    // purchases with no click (user 2): own time vs T
    (3L, T - 1, 2L, "purchase"),         // T−1 < T → null EMITTED
    (4L, T, 2L, "purchase"))             // T, not < T → withheld

  // one shared write: both tests only read the immutable crafted table
  private lazy val dir = eventsDir(rows)

  test("left-outer: click-null emission is strict ms-floored watermark eviction") {
    val ss = EventStream.statefulSession(spark)
    val out = EventStream.runToMemory(
      EventStream.clickPurchaseLeftJoin(EventStream.readEvents(ss, dir), 10),
      "ojb_left", mode = "append")
    val nullClicks = out.filter(col("p_id").isNull)
      .select("c_id").as[Long].collect().toSet
    assert(nullClicks === Set(1L),
      s"exactly the click 1 ms past expiry must emit null, got $nullClicks")
    val pairs = out.filter(col("p_id").isNotNull)
      .select("c_id", "p_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((900L, 901L)), s"sentinel pair only, got $pairs")
  }

  test("full-outer adds the purchase direction: own-time strict eviction") {
    val ss = EventStream.statefulSession(spark)
    val out = EventStream.runToMemory(
      EventStream.clickPurchaseFullJoin(EventStream.readEvents(ss, dir), 10),
      "ojb_full", mode = "append")
    val nullClicks = out.filter(col("c_id").isNotNull && col("p_id").isNull)
      .select("c_id").as[Long].collect().toSet
    val nullPurchases = out.filter(col("c_id").isNull && col("p_id").isNotNull)
      .select("p_id").as[Long].collect().toSet
    assert(nullClicks === Set(1L), s"click boundary drifted: $nullClicks")
    assert(nullPurchases === Set(3L), s"purchase boundary drifted: $nullPurchases")
    val pairs = out.filter(col("c_id").isNotNull && col("p_id").isNotNull)
      .select("c_id", "p_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((900L, 901L)), s"sentinel pair only, got $pairs")
  }
}
