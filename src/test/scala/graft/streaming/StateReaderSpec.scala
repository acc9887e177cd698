package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The state data source (t29) beyond the entry's hash check: the
  * metadata leg names the operator and store, and the snapshot agrees
  * with what the query itself published — state truth equals output
  * truth for a complete-mode aggregation.
  */
class StateReaderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("state snapshot equals the batch replay; metadata names the operator") {
    val (snapshot, meta) = EventStream.stateStoreSnapshot(spark, dir)
    val got = snapshot.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.Tables.t(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)

    val m = meta.collect()
    assert(m.length === 1, s"one stateful operator expected: ${m.toSeq}")
    val row = m.head
    assert(row.getAs[String]("operatorName") === "stateStoreSave")
    assert(row.getAs[String]("stateStoreName") === "default")
    // the stateful session pins shuffle partitions to 4; state stores
    // are created per shuffle partition
    assert(row.getAs[Int]("numPartitions") === 4)
  }
}
