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
  * the latest right PAYLOAD STRUCT forward into each left row. The struct
  * matters: carrying columns individually with `last(..., ignoreNulls)`
  * would skip a right row whose payload value is genuinely null (and could
  * stitch different right rows together when several columns are carried) —
  * one struct per right row keeps the as-of row atomic, nulls included.
  * Cost is ONE shuffle on the key — no per-row range probe, no broadcast
  * requirement, and skew follows the key distribution exactly like any
  * keyed window. Right rows sort before left rows at equal timestamps, so
  * t_left == t_right matches (inclusive as-of, DuckDB ASOF `>=`
  * semantics). Null join keys never match (right null-key rows are
  * dropped, left null-key rows get null payloads) — equi-join semantics.
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     rows to pick from (latest-at-or-before wins)
    * @param key       equi-key column name present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`; (key, rightTime) pairs
    *                  should be unique or the winner among ties is
    *                  unspecified
    * @param rightCols right payload columns to carry onto each left row;
    *                  must not collide with `left`'s columns
    * @return `left` with `rightCols` appended (null when no right row is
    *         at or before the left time)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String,
            rightCols: Seq[String]): DataFrame =
    impl(left, right, key, leftTime, rightTime, rightCols, backward = true)

  /** FORWARD as-of: the single right row with the SMALLEST right time ≥
    * the left time, per key (next-scheduled-event enrichment — the
    * mirror contract of [[apply]], DuckDB ASOF `<=` semantics). Same
    * one-shuffle window shape, mirrored: the frame looks FORWARD and
    * `first` picks the nearest following right payload; left rows sort
    * before right rows at equal timestamps so t_left == t_right still
    * matches inclusively.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightCols: Seq[String]): DataFrame =
    impl(left, right, key, leftTime, rightTime, rightCols, backward = false)

  /** Backward as-of WITH TOLERANCE: the latest right row at or before
    * the left time, but only if it is no staler than `toleranceSeconds`
    * — the pandas/polars `merge_asof(tolerance=…)` contract a
    * time-series enrichment needs when "the last known value" stops
    * being trustworthy after a bound (a quote older than the staleness
    * budget must enrich as NULL, not as stale data). Same one-shuffle
    * window as [[apply]]; the right event time rides along in the
    * payload and one post-pass nulls every carried column atomically
    * when the match is out of budget — the latest-at-or-before row
    * either IS the within-tolerance match or no row is, so filtering
    * after the as-of pick loses nothing.
    */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     rightCols: Seq[String],
                     toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be >= 0: $toleranceSeconds")
    require(!left.columns.contains("_asof_rt") &&
      !right.columns.contains("_asof_rt"),
      "column name _asof_rt is reserved by AsofJoin.backwardWithin")
    val r2 = right.withColumn("_asof_rt", col(rightTime).cast("timestamp"))
    val joined = apply(left, r2, key, leftTime, rightTime,
      rightCols :+ "_asof_rt")
    val fresh = col("_asof_rt").isNotNull &&
      col("_asof_rt") >= col(leftTime).cast("timestamp") -
        expr(s"INTERVAL $toleranceSeconds SECOND")
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop("_asof_rt")
  }

  private def impl(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String], backward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!(leftCols ++ rightCols).exists(Set("_t", "_isLeft", "_rpay")),
      "column names _t, _isLeft and _rpay are reserved by AsofJoin")
    require(rightCols.forall(right.columns.contains),
      s"rightCols not all present on right side: $rightCols")
    require(!rightCols.exists(leftCols.contains),
      s"rightCols collide with left columns: ${rightCols.filter(leftCols.contains)}")

    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val l = left
      .withColumn("_t", col(leftTime).cast("timestamp"))
      .withColumn("_isLeft", lit(true))
      .withColumn("_rpay", lit(null).cast(payloadType))
    // null-key right rows can never match under equi-join semantics; left
    // null-key rows survive with a null payload (their window partition
    // contains no right rows). Null-TIME right rows are dropped too: a
    // `>=` comparison with NULL never matches (DuckDB ASOF contract), but
    // the window's nulls-first ordering would otherwise carry them into
    // every left row that precedes any timestamped right row.
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key), col(rightTime).cast("timestamp").as("_t"),
        lit(false).as("_isLeft"),
        struct(rightCols.map(col): _*).as("_rpay"))
      .withColumns(leftCols.filterNot(_ == key).map(c =>
        c -> lit(null).cast(left.schema(c).dataType)).toMap)

    // backward: right-BEFORE-left at equal _t + a backward frame + last();
    // forward: left-before-right at equal _t + a forward frame + first() —
    // either way the equal-timestamp right row is inside the frame, so
    // the as-of bound is inclusive in both directions
    val w =
      if (backward)
        Window.partitionBy(key).orderBy(col("_t"), col("_isLeft"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(key).orderBy(col("_t"), col("_isLeft").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pick =
      if (backward) last(when(!col("_isLeft"), col("_rpay")), ignoreNulls = true)
      else first(when(!col("_isLeft"), col("_rpay")), ignoreNulls = true)
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("_rpay", pick.over(w))
      .filter(col("_isLeft"))
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"_rpay.$c").as(c)): _*)
  }
}
