package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-join semantics and equivalence with the naive inequality join —
  * including intervals that span bin boundaries and bins much smaller or
  * larger than the interval.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, ts("2024-01-01 10:30:00")),
    (2L, ts("2024-01-01 11:59:59")),
    (3L, ts("2024-01-01 12:00:00")),
    (4L, ts("2024-01-02 00:00:00"))
  ).toDF("pid", "pt")

  private lazy val intervals = Seq(
    (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")), // spans bins
    (11L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")), // crosses midnight
    (12L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00"))  // matches nothing
  ).toDF("iid", "lo", "hi")

  test("matches exactly the naive inequality join at any bin width") {
    val naive = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive === Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 11L)))
    for (bin <- Seq(60L, 3600L, 7200L, 86400L)) {
      val binned = RangeJoin(points, "pt", intervals, "lo", "hi", bin)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned === naive, s"bin=$bin diverges")
    }
  }

  test("plan is an equi-join on the bin, not a nested loop") {
    val plan = RangeJoin(points, "pt", intervals, "lo", "hi", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"degraded to a loop join:\n$plan")
  }
}
