package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(Long, Long, Long)], id: String, s: String, e: String) =
    rows.toDF(id, "_s", "_e")
      .select(col(id), timestamp_seconds(col("_s")).as(s),
        timestamp_seconds(col("_e")).as(e))

  test("each overlapping pair appears exactly once, across many bins") {
    // bin = 10 s. a1 spans 35 bins; a1×b1 share many bins but must emit once.
    val a = mk(Seq((1L, 0L, 350L), (2L, 500L, 520L), (3L, 900L, 910L)),
      "a_id", "a_start", "a_end")
    val b = mk(Seq((10L, 100L, 340L), // overlaps a1 over 24 bins
      (20L, 515L, 600L),              // overlaps a2
      (30L, 700L, 800L)),             // overlaps nothing
      "b_id", "b_start", "b_end")
    val got = IntervalJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        binSeconds = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted === Seq((1L, 10L), (2L, 20L)))
    assert(got.size === got.distinct.size, "positional dedup must yield unique pairs")
  }

  test("boundary touch is an overlap (inclusive ends), disjoint is not") {
    val a = mk(Seq((1L, 0L, 100L)), "a_id", "a_start", "a_end")
    val b = mk(Seq((10L, 100L, 200L), (20L, 101L, 200L)),
      "b_id", "b_start", "b_end")
    val got = IntervalJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        binSeconds = 60)
      .select("b_id").as[Long].collect().toSeq
    assert(got === Seq(10L))
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    val a = mk(Seq((1L, 0L, 100L)), "a_id", "a_start", "a_end")
    val b = mk(Seq((10L, 50L, 150L)), "b_id", "b_start", "b_end")
    val plan = IntervalJoin(a, "a_start", "a_end", b, "b_start", "b_end",
      binSeconds = 60).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"degraded to a loop:\n$plan")
  }

  test("replication guard fires on an interval far wider than the bin") {
    val a = mk(Seq((1L, 0L, 1000000L)), "a_id", "a_start", "a_end")
    val b = mk(Seq((10L, 0L, 10L)), "b_id", "b_start", "b_end")
    val ex = intercept[Exception] {
      IntervalJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        binSeconds = 10, maxReplication = 100).count()
    }
    assert(ex.getMessage.contains("maxReplication") ||
      ex.getCause != null && ex.getCause.getMessage.contains("maxReplication"))
  }

  test("inverted intervals fail loudly instead of exploding the bin array") {
    // end < start by 1e6 s: hi - lo + 1 is NEGATIVE, so a naive
    // replication check passes and sequence(lo, hi) would emit a ~1e5-bin
    // descending array per row.
    val a = mk(Seq((1L, 1000000L, 0L)), "a_id", "a_start", "a_end")
    val b = mk(Seq((10L, 0L, 10L)), "b_id", "b_start", "b_end")
    val ex = intercept[Exception] {
      IntervalJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        binSeconds = 10, maxReplication = 100).count()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(ex).contains("inverted interval"))
  }

  test("shared column names are rejected, not silently misresolved") {
    val a = mk(Seq((1L, 0L, 10L)), "id", "s", "e")
    val ex = intercept[IllegalArgumentException] {
      IntervalJoin(a, "s", "e", a, "s", "e", binSeconds = 10)
    }
    assert(ex.getMessage.contains("share column name"))
  }
}
