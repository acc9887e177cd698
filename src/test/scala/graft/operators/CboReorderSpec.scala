package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CostBasedJoinReorder is OFF by default and declines silently — these
  * specs pin both the flip (stats present ⇒ the selective dim joins
  * first) and each decline condition the j23 entry's assertion guards
  * against, so a future Spark upgrade changing the default surfaces
  * here instead of as a silent plan change.
  */
class CboReorderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // star: fact (6k rows) + bulky dim (1.5k, no reduction) + tiny
  // selective dim (10 of 200 parts — the join that shrinks the fact).
  // The *_ns twins are byte-identical but never ANALYZEd.
  private lazy val tables: Unit = {
    val l = Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val o = Tables.t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val p = Tables.t(spark, dir, "part")
      .filter(col("p_partkey") % 20 === 0).select("p_partkey", "p_size")
    for ((df, name) <- Seq((l, "cbos_lineitem"), (o, "cbos_orders"),
        (p, "cbos_part20"))) {
      df.write.mode("overwrite").saveAsTable(name)
      df.write.mode("overwrite").saveAsTable(name + "_ns")
    }
    spark.sql("ANALYZE TABLE cbos_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_partkey")
    spark.sql("ANALYZE TABLE cbos_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey")
    spark.sql("ANALYZE TABLE cbos_part20 COMPUTE STATISTICS FOR COLUMNS p_partkey")
  }

  // syntactic order joins the bulky dim FIRST; a cost-based reorder
  // should pull the selective dim forward
  private def q(ss: org.apache.spark.sql.SparkSession, suffix: String) =
    ss.sql(
      s"""SELECT count(*) AS n,
         |       sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS cents
         |FROM cbos_lineitem$suffix l
         |JOIN cbos_orders$suffix o ON l.l_orderkey = o.o_orderkey
         |JOIN cbos_part20$suffix p ON l.l_partkey = p.p_partkey""".stripMargin)

  test("stats + cbo flip the join order; the un-analyzed twin keeps syntax") {
    tables
    val ss = CboReorder.cboSession(spark)
    val flipped = CboReorder.requireReordered(
      q(ss, ""), q(ss, "_ns"), selective = "cbos_part20", bulky = "cbos_orders")
    // the reorder is a plan change, never a semantics change
    val a = flipped.collect().head
    val b = q(ss, "_ns").collect().head
    assert(a === b, "reordered and syntactic plans must agree on results")
    assert(a.getLong(0) > 0, "the star join must produce rows")
  }

  test("decline: cbo.enabled off keeps the syntactic order even WITH stats") {
    tables
    val order = CboReorder.leafOrder(q(spark, "")) // parent: cbo off
    assert(order.indexWhere(_.contains("cbos_part20")) >
      order.indexWhere(_.contains("cbos_orders")),
      s"cbo off must keep the user's join order: $order")
  }

  test("decline: ONE un-analyzed side vetoes the whole reorder") {
    tables
    val ss = CboReorder.cboSession(spark)
    // orders_ns has no row-count stats; lineitem + part20 do
    val mixed = ss.sql(
      """SELECT count(*) AS n FROM cbos_lineitem l
        |JOIN cbos_orders_ns o ON l.l_orderkey = o.o_orderkey
        |JOIN cbos_part20 p ON l.l_partkey = p.p_partkey""".stripMargin)
    val order = CboReorder.leafOrder(mixed)
    assert(order.indexWhere(_.contains("cbos_part20")) >
      order.indexWhere(_.contains("cbos_orders")),
      s"a single stats-less side must veto the reorder: $order")
  }
}
