package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn a change log of
  * (key, ts, value) observations into validity intervals — one row per
  * RUN of consecutive equal values, with `[valid_from, valid_to)`
  * half-open bounds and an `is_current` flag on each key's open run. The
  * complement of [[SnapshotDiff]]: diff compares two snapshots, this
  * folds a full event history into the dimension table a warehouse would
  * serve as-of queries from.
  *
  * Scale shape: ONE shuffle on the key. Run starts are marked with a
  * `lag` window, non-starts filtered out, and `valid_to` read with a
  * `lead` over the same (partition, order) — the filter preserves the
  * window exchange's partitioning and order, so Catalyst plans both
  * windows off a single sort with no second exchange. No groupBy, no
  * islands-style run numbering — the run-start row IS the output row.
  */
object Scd2 {

  /** @param tieCol deterministic tie-break for equal timestamps (an event
    *               id); runs and bounds are then unique for any input.
    *               Values may be null: a null run is a run like any other
    *               (null-safe change test).
    */
  def history(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
              valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(valueCol), 1).over(w)
    // First-row test is positional (row_number), NOT lag(ts).isNull — a
    // null timestamp sorting first would otherwise mark its SUCCESSOR as
    // a run start too, splitting one run of equal values in two.
    df.select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("_start",
        row_number().over(w) === 1 || !(prev <=> col(valueCol)))
      .filter(col("_start"))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
