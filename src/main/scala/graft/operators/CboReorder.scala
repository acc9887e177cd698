package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Cost-based join reordering, plan-ASSERTED (j23) — the COMPILE-TIME
  * sibling of the engine's runtime adaptivity entries (AQE skew j21,
  * runtime bloom j22): `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`
  * gives the catalog row counts + column NDVs, and Spark's
  * `CostBasedJoinReorder` uses them to re-associate a multi-way inner
  * join so the most selective dimension joins FIRST — at 100 TB the
  * difference between shuffling a fact-sized intermediate through every
  * later join and shrinking it at step one.
  *
  * Like the runtime rules, it declines SILENTLY under many conditions —
  * `spark.sql.cbo.enabled` off (the default!), `joinReorder.enabled`
  * off, ANY join side missing row-count stats (an un-analyzed table, a
  * fresh parquet path), fewer than three reorderable items, or a
  * non-inner join in the tree — and a pipeline that believes its join
  * order is stats-driven silently runs the user's syntactic order.
  * [[requireReordered]] / [[leafOrder]] make the claim checkable; the
  * j23 entry asserts the flip against an un-analyzed twin of the same
  * star, and CboReorderSpec pins each decline condition.
  */
object CboReorder {

  /** Cloned session with the cost-based optimizer ON (both flags — the
    * second gates the reorder rule specifically). Everything else stays
    * the parent's; stats come from the shared catalog, so ANALYZE run
    * here is visible to the parent and vice versa.
    */
  def cboSession(parent: SparkSession): SparkSession = {
    val ss = parent.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      parent.conf.get("spark.sql.shuffle.partitions"))
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    ss
  }

  /** The optimized plan's leaf relations left-to-right — for a
    * left-deep join tree this IS the join order. Catalog tables render
    * as their table name; other leaves fall back to the node name.
    */
  def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map(leafName)

  private def leafName(p: LogicalPlan): String = p match {
    case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      l.catalogTable.map(_.identifier.table).getOrElse(l.relation.toString)
    case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
      r.tableMeta.identifier.table
    case other => other.nodeName
  }

  /** Fail LOUDLY unless the stats-driven plan reordered: in `withStats`
    * the `selective` table must appear BEFORE `bulky` in the leaf order
    * (the cheap join runs first), while `noStats` must still carry the
    * user's syntactic order with `selective` last — proving the flip
    * came from the statistics, not from syntax or a default rewrite.
    */
  def requireReordered(withStats: DataFrame, noStats: DataFrame,
                       selective: String, bulky: String): DataFrame = {
    def pos(order: Seq[String], t: String): Int = {
      val i = order.indexWhere(_.contains(t))
      require(i >= 0, s"table $t not found among leaves $order")
      i
    }
    val reordered = leafOrder(withStats)
    val syntactic = leafOrder(noStats)
    require(pos(syntactic, selective) > pos(syntactic, bulky),
      s"control is broken: the un-analyzed twin was ALSO reordered " +
        s"($syntactic) — the flip cannot be attributed to statistics")
    require(pos(reordered, selective) < pos(reordered, bulky),
      s"cost-based join reorder did NOT fire: leaf order $reordered " +
        s"still joins $bulky before $selective (un-analyzed twin: " +
        s"$syntactic). Check cbo.enabled/joinReorder.enabled and that " +
        "every joined table has row-count statistics")
    withStats
  }
}
