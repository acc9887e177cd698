package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout behavior: partition pruning on partitioned parquet and
  * shuffle-free joins on co-bucketed tables — the two levers that make the
  * 100 TB fact/dimension layout work.
  */
class PartitionedStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned write + filtered read prunes partitions") {
    val tmp = Files.createTempDirectory("pstore_").toString
    val events = Tables.t(spark, dir, "events")
      .select("event_id", "user_id", "event_type")
    PartitionedStore.writePartitioned(events, tmp, Seq("event_type"))

    val pruned = PartitionedStore.read(spark, tmp)
      .filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(plan.contains("event_type"), "partition filter should mention the key")
    // pruning is also semantic: counts match the unpartitioned filter
    val expected = events.filter(col("event_type") === "click").count()
    assert(pruned.count() === expected)
  }

  test("filter and projection push down to the parquet scan") {
    // The scan, not a downstream Filter node, must do the work: a plan
    // that reads all columns for a 2-column projection is wrong at 100 TB.
    val li = Tables.t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val scan = li.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.replaceAll("\\s", "").contains("GreaterThan(l_quantity"),
      s"predicate not pushed to parquet:\n$scan")
    val readSchema = "ReadSchema:.*".r.findFirstIn(scan).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity")
      && !readSchema.contains("l_comment"),
      s"scan should read only projected columns, got: $readSchema")
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.t(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.t(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      PartitionedStore.writeBucketed(orders, "b_orders", 4, Seq("o_orderkey"))
      PartitionedStore.writeBucketed(lineitem, "b_lineitem", 4, Seq("o_orderkey"))

      val joined = PartitionedStore.bucketedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      assert(PartitionedStore.shuffleFree(joined),
        s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")

      // and it is still the same join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
