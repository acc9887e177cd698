package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar densification + forward fill for per-key date series — the
  * feature-pipeline step that turns sparse event aggregates into a
  * contiguous daily series (training features, monitoring, as-of state
  * reconstruction).
  *
  * Scale shape: the spine is built per key from its own [min, max] date
  * span (one agg + one explode — no driver-side calendar, no cross join
  * against a global date dimension), the join back is an equi-join on
  * (key, day), and the forward fill is one running `last(ignoreNulls)`
  * window per key — a single key shuffle, linear in emitted days. The
  * explode fan-out per key is bounded by that key's span; callers with
  * decade-spanning keys should bucket the span first (the same caveat as
  * any densification).
  */
object GapFill {

  /** One row per calendar day in each key's [min(date), max(date)] span,
    * `valueCol` forward-filled from the most recent present day, and a
    * `filled` flag marking densified rows. Input must be unique per
    * (key, date) — it is the output of a daily aggregation.
    */
  def daily(df: DataFrame, keyCol: String, dateCol: String,
            valueCol: String): DataFrame = {
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_d0"), max(col(dateCol)).as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as(dateCol))
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyCol, dateCol), "left")
      .withColumn("filled", col(valueCol).isNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** [[daily]] with LINEAR interpolation instead of forward fill, kept
    * integer-EXACT: a gap day between observations (ph, pc) and (nh, nc)
    * emits the interpolated value as the rational `num/den` with
    * `num = pc·(nh−ph) + (nc−pc)·(h−ph)` and `den = nh−ph` — all
    * integer arithmetic, so no IEEE division whose rounding could
    * diverge between engines (observed days emit `value/1`). Consumers
    * wanting a float divide at the edge; pipelines comparing engines
    * hash the exact rationals. Spine days are bounded by each key's own
    * [min, max] observed dates, so interior gaps always have both
    * neighbors — num/den are never NULL.
    *
    * Same scale shape as [[daily]] plus one extra window pass (the
    * backward scan for the next observation).
    */
  def dailyInterpolated(df: DataFrame, keyCol: String, dateCol: String,
                        valueCol: String): DataFrame = {
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_d0"), max(col(dateCol)).as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as(dateCol))
    val wp = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val h = datediff(col(dateCol), lit("1970-01-01").cast("date")).cast("long")
    val hObs = when(col(valueCol).isNotNull, h)
    spine.join(df, Seq(keyCol, dateCol), "left")
      .withColumn("_h", h)
      .withColumn("_pc", last(col(valueCol), ignoreNulls = true).over(wp))
      .withColumn("_ph", last(hObs, ignoreNulls = true).over(wp))
      .withColumn("_nc", first(col(valueCol), ignoreNulls = true).over(wn))
      .withColumn("_nh", first(hObs, ignoreNulls = true).over(wn))
      .select(col(keyCol), col(dateCol),
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(col("_pc") * (col("_nh") - col("_ph")) +
            (col("_nc") - col("_pc")) * (col("_h") - col("_ph")))
          .cast("long").as("num"),
        when(col(valueCol).isNotNull, lit(1L))
          .otherwise(col("_nh") - col("_ph")).cast("long").as("den"),
        col(valueCol).isNull.as("filled"))
  }
}
