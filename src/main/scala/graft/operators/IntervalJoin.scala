package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: every (left, right) pair whose [start, end]
  * timestamp intervals intersect. The interval×interval sibling of
  * [[RangeJoin]] (point-in-interval): Spark plans a raw pair of
  * inequality predicates as a broadcast nested loop, so both sides bin
  * into `binSeconds` buckets and the join becomes an equi-join on the
  * bin with the exact overlap predicate behind it.
  *
  * Deduplication is positional, not a `distinct`: a pair of overlapping
  * intervals shares every bin in the overlap region, but is EMITTED only
  * in the bin containing `greatest(lStart, rStart)` — the first bin both
  * cover (overlap means max(starts) ≤ min(ends), so that bin is covered
  * by both sides). One predicate instead of a full shuffle over the
  * matched output — the same reason the SimHash pigeonhole join dedups
  * by chunk index.
  *
  * Pick binSeconds near the typical interval length; each side
  * replicates ≈ length/binSeconds + 1 times, guarded by
  * `maxReplication` like [[RangeJoin]].
  */
object IntervalJoin {

  def apply(left: DataFrame, lStart: String, lEnd: String,
            right: DataFrame, rStart: String, rEnd: String,
            binSeconds: Long, maxReplication: Long = 10000L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!(left.columns ++ right.columns).contains("_bin"),
      "column name _bin is reserved by IntervalJoin")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"IntervalJoin sides share column name(s) ${shared.mkString(",")}; " +
        "rename one side — the overlap predicate would be ambiguous")

    Bins.binnedExplode(left, lStart, lEnd, binSeconds, maxReplication,
        "IntervalJoin")
      .join(Bins.binnedExplode(right, rStart, rEnd, binSeconds,
        maxReplication, "IntervalJoin"), Seq("_bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") ===
        floor(unix_timestamp(greatest(col(lStart), col(rStart))) / binSeconds))
      .drop("_bin")
  }
}
