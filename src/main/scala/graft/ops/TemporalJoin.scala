package graft.ops

import org.apache.spark.sql.DataFrame

/** Point-in-time lookup against an SCD2-style dimension (the output shape
  * of [[Scd2.history]]): each fact row joins the single dimension row
  * whose half-open `[validFrom, validTo)` interval contains the fact's
  * timestamp, with a null `validTo` meaning the run is still open. The
  * as-of query a warehouse serves from a type-2 dimension ("what was this
  * customer's status when the item shipped?").
  *
  * Scale shape: a plain equi-join on the KEY with the temporal predicate
  * riding the join condition — one key shuffle, no binning. Binned time
  * joins ([[graft.operators.RangeJoin]]) exist for when there is no
  * selective equi key; here the key carries all the selectivity and the
  * per-key dimension runs are small by construction (one per value
  * change), so the interval probe inside each key group is cheap.
  *
  * Intervals of one key never overlap (an Scd2 invariant), so each fact
  * matches at most one dimension row; a fact before its key's first
  * `validFrom` (or with no dimension key) drops out, inner-join style.
  * Null bounds are OPEN, matching Scd2's output: a null `validTo` is the
  * current run, and a null `validFrom` (a run started by a null-timestamp
  * observation, which Scd2 documents as legal and sorts first) extends
  * back indefinitely — a plain `>=` would return SQL NULL against it and
  * silently drop every fact in the run. The dimension's key column is
  * dropped from the output (it duplicates the fact key).
  */
object TemporalJoin {

  def pointInTime(facts: DataFrame, factKey: String, factTime: String,
                  dim: DataFrame, dimKey: String,
                  validFrom: String = "valid_from",
                  validTo: String = "valid_to"): DataFrame = {
    val shared = facts.columns.toSet.intersect(dim.columns.toSet) --
      (if (factKey == dimKey) Set(factKey) else Set.empty)
    require(shared.isEmpty,
      s"TemporalJoin sides share column name(s) ${shared.mkString(",")}; " +
        "rename one side — downstream references would be ambiguous")
    facts.join(dim,
        facts(factKey) === dim(dimKey) &&
          (dim(validFrom).isNull || facts(factTime) >= dim(validFrom)) &&
          (dim(validTo).isNull || facts(factTime) < dim(validTo)))
      .drop(dim(dimKey))
  }
}
