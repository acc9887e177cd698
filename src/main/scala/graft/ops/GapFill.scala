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
}
