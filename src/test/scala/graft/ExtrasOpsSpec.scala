package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the Extras entries whose point is a subtle
  * behavior: three-valued NOT IN (u7), unpivot as pivot's inverse (w6),
  * and parse_url canonicalization (f21). The DuckDB oracle hash-checks
  * values at verify time; these pin WHY the shapes are what they are.
  */
class ExtrasOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("u7: NOT IN drops NULL probes; plain left_anti would keep them") {
    val r = SparkEntry.queries("u7_notin_null")(spark, dir)
    val rows = r.collect().map(_.getLong(0)).toSet
    // NULL probe rows (o_orderkey % 97 == 0) must vanish under 3VL
    assert(rows.forall(_ % 97 != 0))
    // reference computation, driver-side
    val neg = Tables.t(spark, dir, "customer")
      .where(col("c_acctbal") < 0).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val expected = Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .filter(o => o.getLong(0) % 97 != 0 && !neg.contains(o.getLong(1)))
      .map(_.getLong(0)).toSet
    assert(rows === expected)
    // a naive left_anti keeps the NULL probes — the difference is exactly them
    val naive = Tables.t(spark, dir, "orders")
      .withColumn("probe",
        when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_custkey")))
      .join(Tables.t(spark, dir, "customer").where(col("c_acctbal") < 0)
          .select(col("c_custkey").as("probe")),
        Seq("probe"), "left_anti")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert((naive -- rows).forall(_ % 97 == 0) && (naive -- rows).nonEmpty)
    // planned as an anti join, not a cartesian scan
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(500))
  }

  test("u7: a NULL in the subquery empties the result entirely") {
    Seq("orders", "customer").foreach(n =>
      Tables.t(spark, dir, n).createOrReplaceTempView(n))
    val n = spark.sql(
      """SELECT o_orderkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END FROM customer)""".stripMargin)
      .count()
    assert(n === 0)
  }

  test("u9/j13: correlated subqueries decorrelate (no per-row nested loop)") {
    val u9 = SparkEntry.queries("u9_scalar_subquery")(spark, dir)
      .queryExecution.executedPlan.toString
    // scalar subquery → one aggregate + outer join, never a loop join
    assert(!u9.contains("NestedLoop") && !u9.contains("CartesianProduct"), u9.take(800))
    assert(u9.contains("Aggregate"), u9.take(800))
    val j13 = SparkEntry.queries("j13_lateral_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    // LATERAL ORDER BY/LIMIT → rank-limit window, not a per-row subquery
    assert(j13.contains("WindowGroupLimit"), j13.take(800))
    assert(!j13.contains("CartesianProduct"), j13.take(800))
  }

  test("a19/x16/g1/g2: plan shapes match their scale claims") {
    // a19: the exact-confirm pass joins the ≤m-candidate set BROADCAST —
    // the item stream is never shuffled for the join
    val a19 = SparkEntry.queries("a19_heavy_hitters")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(a19.contains("BroadcastHashJoin"), a19.take(800))
    // x16: the top-50 is TakeOrderedAndProject (per-partition partial
    // top-k), never a global Sort over the full pair table
    val x16 = SparkEntry.queries("x16_bpe_pair_counts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(x16.contains("TakeOrderedAndProject"), x16.take(800))
    assert(!x16.contains("GlobalLimit"), x16.take(800))
    // g1/g2: every iterative graph round stays an equi-join — no
    // cartesian product, no nested loop anywhere in the final plan
    Seq("g1_pagerank", "g2_label_propagation").foreach { k =>
      val p = SparkEntry.queries(k)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$k: ${p.take(500)}")
    }
  }

  test("x26/g8/w15/a24: round-8 plan shapes match their scale claims") {
    // x26: the weighted top-k is TakeOrderedAndProject over per-row
    // array math — per-partition heaps, never a global Sort, no explode
    val x26 = SparkEntry.queries("x26_weighted_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(x26.contains("TakeOrderedAndProject"), x26.take(800))
    assert(!x26.contains("Generate"), x26.take(800))
    // g8: every PPR round is an equi-join — no cartesian, no nested loop
    val g8 = SparkEntry.queries("g8_ppr")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!g8.contains("CartesianProduct") && !g8.contains("NestedLoop"),
      g8.take(500))
    // w15: the per-user min-us side joins BROADCAST (one row per user);
    // the fold itself is per-row array math, no second wide shuffle
    val w15 = SparkEntry.queries("w15_ewma")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(w15.contains("BroadcastHashJoin"), w15.take(800))
    // a24: the bitmap aggs plan SortAggregate (binary buffers are not
    // hash-agg mutable types — Spark-inherent), but the partial halves
    // run MAP-SIDE before each exchange, which is the scale claim: the
    // id stream combines locally, only (key, bitmap) partials shuffle
    val a24 = SparkEntry.queries("a24_bitmap_distinct")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(a24.contains("partial_bitmap_construct_agg") &&
      a24.contains("partial_bitmap_or_agg"), a24.take(1200))
  }

  test("w6: unpivot is the inverse of pivot on the part metrics") {
    val orig = Tables.t(spark, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
    val long = SparkEntry.queries("w6_unpivot")(spark, dir)
    assert(long.count() === orig.count() * 2)
    val back = long.groupBy("p_partkey")
      .pivot("metric", Seq("p_size", "p_retailprice")).agg(first("val"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("f21: canonical URL lowercases host, keeps query, drops fragment") {
    val r = SparkEntry.queries("f21_url_canonicalize")(spark, dir)
      .where(col("doc_id") === 1).collect().head
    val lang = Tables.t(spark, dir, "documents")
      .where(col("doc_id") === 1).select("lang").collect().head.getString(0)
    val source = Tables.t(spark, dir, "documents")
      .where(col("doc_id") === 1).select("source").collect().head.getString(0)
    assert(r.getAs[String]("host") === s"$source.Example.COM")
    assert(r.getAs[String]("path") === "/docs/1")
    assert(r.getAs[String]("lang_param") === lang)
    assert(r.getAs[String]("canonical") ===
      s"https://${source.toLowerCase}.example.com/docs/1?lang=$lang")
  }

  test("w16 OHLC downsample is ONE shuffle, no window, no sort") {
    import spark.implicits._
    val e = (1L to 5000L).map(i =>
        ("click", 1700000000000000L + i * 1000000L, i, i % 97))
      .toDF("event_type", "us", "event_id", "cents")
      .repartition(8)
    val bars = e.groupBy(col("event_type"), expr("us div 3600000000").as("h"))
      .agg(min(struct(col("us"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        max(struct(col("us"), col("event_id"), col("cents")))
          .getField("cents").as("close"),
        count(lit(1)).as("n_ticks"))
    bars.collect()
    // the AQE string repeats the tree under "== Initial Plan ==" — count
    // only the final plan. The input repartition(8) is a roundrobin
    // exchange; the OPERATOR contributes exactly one hash exchange, with
    // partial struct-min/max aggregates below it (map-side bars — struct
    // aggs plan as SortAggregate since struct buffers aren't hash-agg
    // mutable, the d15 note; the sorts are within-partition, not global)
    val plan = bars.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one agg shuffle:\n${plan.take(1500)}")
    assert(plan.contains("partial_min(struct"),
      s"bar partials must be map-side:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      s"OHLC must not plan a window:\n${plan.take(1500)}")
    // deterministic open/close under any input partitioning
    val again = e.repartition(3).groupBy(col("event_type"),
        expr("us div 3600000000").as("h"))
      .agg(min(struct(col("us"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max(struct(col("us"), col("event_id"), col("cents")))
          .getField("cents").as("close"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val base = bars.select("event_type", "h", "open", "close")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(again === base)
  }
}
