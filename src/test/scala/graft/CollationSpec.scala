package graft

import org.apache.spark.sql.functions._

/** f23's collation contract: UTF8_LCASE equality is case-insensitive
  * where binary equality is not, and a collated join key still plans as
  * an ordinary equi-join — the hash/sort-merge machinery, never a
  * nested loop (the plan property that makes collations usable at
  * scale: a forgotten lower() drops rows silently; a collated column
  * carries its comparison semantics with it).
  */
class CollationSpec extends SparkSpec {

  import spark.implicits._

  test("UTF8_LCASE equality is case-insensitive; binary is not") {
    val got = Seq(("Building", "BUILDING"), ("auto", "AUTO"), ("a", "b"))
      .toDF("l", "r")
      .select(
        (collate(col("l"), "UTF8_LCASE") === collate(col("r"), "UTF8_LCASE")).as("ci"),
        (col("l") === col("r")).as("bin"))
      .as[(Boolean, Boolean)].collect().toList
    assert(got === List((true, false), (true, false), (false, false)))
  }

  test("a collated join key plans as an equi-join, not a nested loop") {
    val left = Seq("BUILDING", "building", "AUTO").toDF("seg")
    val right = Seq("building", "auto").toDF("segment")
    val joined = left.join(right,
      collate(col("seg"), "UTF8_LCASE") === collate(col("segment"), "UTF8_LCASE"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"),
      s"collated equality must stay an equi-join:\n$physical")
    assert(physical.contains("HashJoin") || physical.contains("SortMergeJoin"),
      s"expected a hash or sort-merge join:\n$physical")
    assert(joined.count() === 3)
  }

  test("collated grouping merges case variants deterministically via a lowercase output key") {
    val df = Seq("BUILDING", "Building", "building", "AUTO")
      .toDF("seg")
      .groupBy(collate(lower(col("seg")), "UTF8_LCASE").as("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k").cast("string").as("k"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(df === Map("building" -> 3L, "auto" -> 1L))
  }
}
