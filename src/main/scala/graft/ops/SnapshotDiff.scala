package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-set extraction between two snapshots of a keyed table: the
  * distributed form of the reference's incremental-recrawl bookkeeping
  * (crawl.py re-fetches a page and upserts only what changed; at warehouse
  * scale the same question is "diff yesterday's snapshot against today's
  * and ship I/U/D rows downstream" — the input a [[Upsert]] or a CDC
  * consumer wants).
  *
  * One full outer join on the key columns (null-safe), classify:
  * `I` = key only in the new snapshot, `D` = only in the old, `U` = in
  * both with any non-key column differing (null-safe compare). Unchanged
  * rows — the overwhelming majority between adjacent snapshots — are
  * dropped before anything is shuffled onward. Scale shape: the join is
  * the canonical co-partitionable shuffle (bucket both snapshots by key to
  * make it exchange-free, see sources.PartitionedStore); the output is
  * bounded by the churn rate, not the table.
  */
object SnapshotDiff {

  /** PRECONDITION: `keys` must be unique within each snapshot — duplicate
    * keys fan out through the full-outer join into a cross product of
    * spurious U/changed rows with no error. Pass
    * `assertUniqueKeys = true` to verify (runs one count job per side at
    * construction — cheap next to the diff itself, but off by default so
    * callers that already guarantee uniqueness, e.g. an upstream
    * [[Upsert]] sink, don't pay it).
    *
    * @return one row per changed key: key columns, `op` ∈ {I, U, D}, and
    *         `old_<c>` / `new_<c>` for every non-key column `c`.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           assertUniqueKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    if (assertUniqueKeys) {
      Seq("old" -> oldDf, "new" -> newDf).foreach { case (side, df) =>
        val dups = df.groupBy(keys.map(col): _*).count()
          .filter(col("count") > 1).limit(1).collect()
        require(dups.isEmpty,
          s"SnapshotDiff: duplicate key in $side snapshot: ${dups.head}")
      }
    }
    require(oldDf.columns.sameElements(newDf.columns),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    // the output/internal namespace must be free, or the final select
    // resolves ambiguously (same contract as SkewJoin's _salt guard)
    val reserved = Set("op", "_in_old", "_in_new") ++
      keys.map(k => s"_nk_$k") ++
      valueCols.flatMap(c => Seq(s"old_$c", s"new_$c"))
    val clash = oldDf.columns.filter(reserved.contains)
    require(clash.isEmpty, s"reserved column name(s) in input: ${clash.mkString(",")}")
    val o = oldDf.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("_in_old"): _*)
    val n = newDf.select(
      keys.map(c => col(c).as(s"_nk_$c")) ++
        valueCols.map(c => col(c).as(s"new_$c")) :+ lit(true).as("_in_new"): _*)
    val cond = keys.map(k => o(k) <=> n(s"_nk_$k")).reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
    val changed =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    val op = when(col("_in_old").isNull, "I")
      .when(col("_in_new").isNull, "D")
      .when(changed, "U")
    joined
      .select(keys.map(k => coalesce(o(k), n(s"_nk_$k")).as(k)) ++
        Seq(op.as("op")) ++
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
      .where(col("op").isNotNull)
  }
}
