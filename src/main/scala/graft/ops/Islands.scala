package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands condense: a sorted set of ints per key becomes a
  * display string like "2007-2010, 2012" — the Spark re-expression of the
  * reference's `condense` (crawl.py:509-530).
  *
  * Pure-SQL islands formulation: `v - row_number() over (partition by key
  * order by v)` is constant within each consecutive run; group on it and
  * take min/max. Distributed-safe: the window partitions by key, so no
  * global sort; per-key cardinality is small (years), so the final
  * collect_list per key is bounded.
  */
object Islands {
  /** @param df    input with one row per (key, value); duplicates allowed
    * @param keys  grouping columns
    * @param value integer column to condense
    * @param out   name of the resulting string column
    */
  def condense(df: DataFrame, keys: Seq[String], value: String,
               out: String = "condensed"): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(value))
    val runs = df
      .select((keyCols :+ col(value).cast("long").as(value)): _*)
      .dropDuplicates(keys :+ value)
      .withColumn("_grp", col(value) - row_number().over(w))
      .groupBy((keyCols :+ col("_grp")): _*)
      .agg(min(value).as("_lo"), max(value).as("_hi"))
      .withColumn("_label",
        when(col("_lo") === col("_hi"), col("_lo").cast("string"))
          .otherwise(concat_ws("-", col("_lo"), col("_hi"))))
    runs
      .groupBy(keyCols: _*)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_lo"), col("_label")))),
          s => s.getField("_label")),
        ", ").as(out))
  }
}
