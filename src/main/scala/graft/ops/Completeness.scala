package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-completeness gate: drop every row of a group if ANY member of the
  * group fails a predicate — the reference's "withhold a (year, chamber)
  * from export until fully crawled" policy (dump.py:26-31,
  * match_names.py:93-94).
  *
  * Implemented as an aggregated boolean per group + broadcast-friendly
  * semi join (the group table is tiny relative to the fact table), so the
  * fact side is scanned once and never shuffled on the group key unless
  * the optimizer chooses to.
  */
object Completeness {
  /** Keep only rows whose group has no row violating `ok`. */
  def gate(df: DataFrame, keys: Seq[String], ok: Column): DataFrame = {
    val complete = df.groupBy(keys.map(col): _*)
      .agg(min(ok.cast("int")).as("_all_ok"))
      .filter(col("_all_ok") === 1)
      .select(keys.map(col): _*)
    df.join(broadcast(complete), keys, "left_semi")
  }
}
