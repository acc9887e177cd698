package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** As-of join semantics: latest-at-or-before per key, inclusive bound,
  * null when nothing precedes, and unmatched-key behavior.
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at or before each left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 11:30:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "a"),  // between 10 and 11 → 100
      (1L, ts("2024-01-01 11:00:00"), "b"),  // exactly 11 → inclusive → 110
      (1L, ts("2024-01-01 09:00:00"), "c"),  // before any quote → null
      (2L, ts("2024-01-01 12:00:00"), "d"),  // → 200
      (3L, ts("2024-01-01 12:00:00"), "e")   // key with no quotes → null
    ).toDF("key", "tts", "trade")

    val out = AsofJoin(trades, quotes, "key", "tts", "qts", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out === Map(
      "a" -> Some(100.0), "b" -> Some(110.0), "c" -> None,
      "d" -> Some(200.0), "e" -> None))
  }

  test("null right times never match (NULL >= comparison semantics)") {
    // a null-time right row would sort nulls-first in the carry window and
    // leak its payload into left rows preceding any timestamped right row
    val quotes = Seq(
      (1L, None: Option[Timestamp], 666.0),
      (1L, Option(ts("2024-01-01 11:00:00")), 110.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "early"), // precedes all real quotes → null
      (1L, ts("2024-01-01 12:00:00"), "late")   // → 110, never 666
    ).toDF("key", "tts", "trade")
    val out = AsofJoin(trades, quotes, "key", "tts", "qts", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out === Map("early" -> None, "late" -> Some(110.0)))
  }

  test("null right payloads carry through; null keys never match") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option("a")),
      (1L, ts("2024-01-01 11:00:00"), None, Option("b")),       // null price IS the as-of value
      (Option.empty[Long].getOrElse(-1L), ts("2024-01-01 09:00:00"), Option(7.0), Option("z"))
    ).toDF("key", "qts", "price", "src")
    val quotesWithNullKey = quotes.withColumn("key",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("key") === -1L, null)
        .otherwise(org.apache.spark.sql.functions.col("key")))
    val trades = Seq(
      (Option(1L), ts("2024-01-01 12:00:00"), "t1"),
      (Option.empty[Long], ts("2024-01-01 12:00:00"), "t2")     // null key → no match
    ).toDF("key", "tts", "trade")

    val out = AsofJoin(trades, quotesWithNullKey, "key", "tts", "qts",
        Seq("price", "src"))
      .collect().map(r => r.getString(2) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    // t1's as-of row is the 11:00 quote: price null AND src "b" — both
    // fields from the SAME row, the null not skipped for an older price
    assert(out("t1") === ((None, Some("b"))))
    // t2 has a null key: must not pick up the null-key quote
    assert(out("t2") === ((None, None)))
  }

  test("left row count and columns are preserved") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x", 7))
      .toDF("key", "t", "payload", "extra")
    val right = Seq((1L, ts("2023-12-31 00:00:00"), 1.5))
      .toDF("key", "rt", "v")
    val out = AsofJoin(left, right, "key", "t", "rt", Seq("v"))
    assert(out.columns.toSeq === Seq("key", "t", "payload", "extra", "v"))
    assert(out.count() === 1)
    assert(out.head().getDouble(4) === 1.5)
  }

  test("forward: picks the earliest right row at or after each left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 11:30:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "a"),  // next at 11 → 110
      (1L, ts("2024-01-01 11:00:00"), "b"),  // exactly 11 → inclusive → 110
      (1L, ts("2024-01-01 12:30:00"), "c"),  // after every quote → null
      (2L, ts("2024-01-01 10:00:00"), "d"),  // → 200
      (3L, ts("2024-01-01 12:00:00"), "e")   // key with no quotes → null
    ).toDF("key", "tts", "trade")
    val out = AsofJoin.forward(trades, quotes, "key", "tts", "qts", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out === Map(
      "a" -> Some(110.0), "b" -> Some(110.0), "c" -> None,
      "d" -> Some(200.0), "e" -> None))
  }

  test("forward is backward's mirror: equal results under time negation") {
    val rnd = new scala.util.Random(7L)
    val base = ts("2024-01-01 00:00:00").getTime
    val left = (1 to 60).map(i =>
      (rnd.nextInt(4).toLong, new Timestamp(base + rnd.nextInt(86400) * 1000L), i))
      .toDF("key", "t", "id")
    // right times UNIQUE per key by construction (i·97 s strides): the
    // tie-winner among equal right timestamps is unspecified, which
    // would make the mirror comparison flaky, not wrong
    val right = (1 to 40).map(i =>
      (i % 4L, new Timestamp(base + (i * 97 + 13) * 1000L), i * 10))
      .toDF("key", "rt", "v")
    // forward(t) == backward(-t): negate both time axes (seconds around a
    // pivot keep timestamp type) and compare payload picks row-for-row
    import org.apache.spark.sql.functions._
    def neg(df: org.apache.spark.sql.DataFrame, c: String) =
      df.withColumn(c, timestamp_seconds(lit(3000000000L) - unix_timestamp(col(c))))
    val fwd = AsofJoin.forward(left, right, "key", "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    val mirrored = AsofJoin(neg(left, "t"), neg(right, "rt"), "key", "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(fwd === mirrored, "forward must equal backward on the negated time axis")
  }
}
