package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the greatest
  * right time ≤ the left time, per key — the time-series join Spark has no
  * built-in operator for (SURVEY.md §2 custom-operator preference (a):
  * compose existing ops).
  *
  * Implementation is the scale shape, not the nested-loop shape: tag and
  * union both sides, then one window pass per key ordered by time carries
  * the latest right payload forward into each left row
  * (`last(..., ignoreNulls)` over rows-unbounded-preceding). Cost is ONE
  * shuffle on the key — no per-row range probe, no broadcast requirement,
  * and skew follows the key distribution exactly like any keyed window.
  * Right rows sort before left rows at equal timestamps, so t_left ==
  * t_right matches (inclusive as-of, DuckDB ASOF `>=` semantics).
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     rows to pick from (latest-at-or-before wins)
    * @param key       equi-key column name present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`; (key, rightTime) pairs
    *                  should be unique or the winner among ties is
    *                  unspecified
    * @param rightCols right payload columns to carry onto each left row
    * @return `left` with `rightCols` appended (null when no right row is
    *         at or before the left time)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String,
            rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!(leftCols ++ rightCols).exists(Set("_t", "_isLeft")),
      "column names _t and _isLeft are reserved by AsofJoin")
    require(rightCols.forall(right.columns.contains),
      s"rightCols not all present on right side: $rightCols")
    // null placeholders must carry the other side's real types — a bare
    // NullType column would fail the union
    val l = left
      .withColumn("_t", col(leftTime).cast("timestamp"))
      .withColumn("_isLeft", lit(true))
      .withColumns(rightCols.map(c =>
        c -> lit(null).cast(right.schema(c).dataType)).toMap)
    val r = right
      .select((Seq(key, rightTime) ++ rightCols).distinct.map(col): _*)
      .withColumn("_t", col(rightTime).cast("timestamp"))
      .withColumn("_isLeft", lit(false))
      .withColumns(leftCols.filterNot(c => c == key).map(c =>
        c -> lit(null).cast(left.schema(c).dataType)).toMap)

    // right-before-left at equal _t makes the as-of bound inclusive
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(l.unionByName(r.select(l.columns.map(col): _*))) {
      (df, c) =>
        df.withColumn(c,
          last(when(!col("_isLeft"), col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_isLeft")).select((leftCols ++ rightCols).map(col): _*)
  }
}
