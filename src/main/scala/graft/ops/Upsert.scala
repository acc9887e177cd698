package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Insert-or-update keyed on `keys` — the Spark re-expression of the
  * reference's `db.update(table, row, keys)` upsert call sites
  * (reference: crawl.py:77, crawl.py:115, crawl.py:166, crawl.py:206).
  *
  * Semantics: rows from `updates` win; `existing` rows whose key does not
  * appear in `updates` are kept unchanged. Implemented as
  * `updates UNION ALL (existing LEFT ANTI JOIN updates ON keys)` — the
  * no-lakehouse-layer equivalent of `MERGE INTO`. At scale the anti join
  * shuffles both sides on the key; when `updates` is small Spark broadcasts
  * it automatically (AQE), which is the common incremental-batch shape.
  */
object Upsert {
  def apply(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val kept = existing.join(updates.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    updates.unionByName(kept)
  }
}
