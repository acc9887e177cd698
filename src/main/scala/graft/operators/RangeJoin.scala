package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left rows whose time falls inside a
  * right-side [start, end] interval. Spark's built-in planner turns a pure
  * inequality join into a broadcast nested loop — O(left × right)
  * comparisons. This operator buckets time into `binSeconds` bins: each
  * interval replicates into the bins it covers (≈ length/binSeconds + 1
  * rows), each left row lands in exactly one bin, and the join becomes an
  * EQUI-join on the bin with an exact containment filter behind it. Cost
  * is pairs-per-bin, not the cross product, and both sides shuffle-
  * partition by bin like any keyed join.
  *
  * Pick binSeconds near the typical interval length: much larger wastes
  * filtering on non-overlapping pairs, much smaller multiplies the
  * interval replication factor.
  */
object RangeJoin {

  /** @param left      rows with a point-in-time column
    * @param leftTime  timestamp column on `left`
    * @param right     rows with [startCol, endCol] timestamp intervals
    * @param startCol  interval start (inclusive)
    * @param endCol    interval end (inclusive)
    * @param binSeconds bucket width in seconds
    * @return inner join of every (left, right) pair with
    *         leftTime ∈ [start, end]; all columns from both sides
    */
  /** @param maxReplication runtime guard: an interval covering more than
    *   this many bins fails loudly instead of silently exploding the right
    *   side (one row per covered bin) — the symptom of a binSeconds far
    *   smaller than the interval length.
    */
  def apply(left: DataFrame, leftTime: String, right: DataFrame,
            startCol: String, endCol: String, binSeconds: Long,
            maxReplication: Long = 10000L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!(left.columns ++ right.columns).contains("_bin"),
      "column name _bin is reserved by RangeJoin")
    val lb = left.withColumn("_bin",
      floor(unix_timestamp(col(leftTime)) / binSeconds))
    val rb = Bins.binnedExplode(right, startCol, endCol, binSeconds,
      maxReplication, "RangeJoin")
    lb.join(rb, Seq("_bin"))
      .filter(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .drop("_bin")
  }
}
