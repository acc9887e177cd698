package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full ANSI `MERGE INTO` semantics over plain DataFrames — the
  * multi-action upgrade of [[Upsert]] (which is MERGE's update+insert
  * subset): WHEN MATCHED AND <cond> THEN DELETE, WHEN MATCHED THEN
  * UPDATE (whole-row image), WHEN NOT MATCHED THEN INSERT. This is the
  * CDC-apply kernel a lakehouse table format runs under the hood; here
  * it is the bare relational core, so it composes with any sink (the
  * reference's crawl loop interleaves row-at-a-time INSERT OR REPLACE
  * and DELETE over SQLite — `crawl.py:77`, `apply_edits.py:62-77` —
  * which is exactly one merge per batch).
  *
  * `source` carries the full new row image per key (the CDC convention);
  * `deleteWhen` is evaluated against the source row. Semantics are
  * CDC-APPLY, which differs from literal ANSI MERGE in two deliberate
  * ways: (1) a delete-flagged source row whose key matches no target is
  * a NO-OP (ANSI's unconditional `WHEN NOT MATCHED THEN INSERT` would
  * insert it — but inserting a row the changelog says is deleted is
  * never what applying a change feed means); (2) the ambiguity guard
  * below raises on ANY duplicate source key, matched or not (ANSI only
  * errors when several source rows hit one target row) — a changelog
  * batch with two images for one key is malformed regardless of the
  * target. Every surviving output row is tagged with the action taken
  * (`update` / `insert` / `keep`) — the audit column a backfill job
  * wants.
  *
  * Scale shape: ONE full-outer shuffle join on the key — no driver-side
  * loop, no per-row round trips. With both sides bucketed on the key
  * (see `j11_bucketed_join`) the exchange disappears entirely; with a
  * small changeset AQE downgrades to a broadcast-able join shape.
  * Presence is tracked with explicit marker literals, never payload
  * nulls — a legitimately-NULL payload column must not masquerade as
  * "row absent".
  */
object Merge {
  def apply(target: DataFrame, source: DataFrame, keyCols: Seq[String],
            deleteWhen: Column): DataFrame = {
    require(source.columns.sorted.sameElements(target.columns.sorted),
      s"schema-aligned merge: ${source.columns.mkString(",")} vs ${target.columns.mkString(",")}")
    val payload = target.columns.filterNot(keyCols.contains).toSeq
    val t = target.select(keyCols.map(col) ++ payload.map(c => col(c).as(s"_t_$c"))
      :+ lit(1).as("_t_present"): _*)
    // NULL condition → action does not fire (MERGE's three-valued WHEN):
    // without the coalesce, `!NULL` is NULL and the WHERE below would
    // silently DROP a matched row whose delete predicate is UNKNOWN.
    // Ambiguity guard: ANSI MERGE errors when several source rows match
    // one target key (Delta's MULTIPLE_SOURCE_ROW error) — a full-outer
    // join would instead silently MULTIPLY the target row, so the guard
    // raises at execution. One window on the join key; no extra action.
    val dupW = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val s = source.withColumn("_del", coalesce(deleteWhen, lit(false)))
      .withColumn("_dupcnt", count(lit(1)).over(dupW))
      .withColumn("_del",
        when(col("_dupcnt") > 1, raise_error(concat(
          lit("MERGE: multiple source rows share key ("),
          concat_ws(",", keyCols.map(col): _*), lit(")"))).cast("boolean"))
          .otherwise(col("_del")))
      .drop("_dupcnt")
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(s"_s_$c"))
        ++ Seq(lit(1).as("_s_present"), col("_del")): _*)
    val matched = col("_s_present").isNotNull && col("_t_present").isNotNull
    val srcOnly = col("_s_present").isNotNull && col("_t_present").isNull
    t.join(s, keyCols.toSeq, "full_outer")
      .where(col("_s_present").isNull || !col("_del")) // deletes drop; absent-key deletes are no-ops
      .select(keyCols.map(col) ++
        payload.map(c =>
          when(col("_s_present").isNotNull, col(s"_s_$c"))
            .otherwise(col(s"_t_$c")).as(c)) :+
        when(matched, "update").when(srcOnly, "insert")
          .otherwise("keep").as("action"): _*)
  }
}
