package graft

import org.apache.spark.sql.functions._

/** a23's mergeability contract, measured: the union of per-group HLL
  * sketches must estimate EXACTLY what one direct whole-corpus sketch
  * estimates (HLL registers are max-combined, so the merged register
  * state equals the directly-built state for the same input set), and
  * the estimate must sit within the published error band of the exact
  * distinct count (lgK = 12 ⇒ ~1.6% RSE; 5% is > 3σ).
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("union of per-type sketches == direct whole-corpus sketch, within error of exact") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    info(s"merged=$merged direct=$direct exact=$exact")
    assert(merged === direct,
      s"union of partial sketches must equal the direct sketch: $merged vs $direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged outside 5% of exact $exact")
  }

  test("sketches are partitioning-independent (pure function of the input set)") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    def est(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    val a = est(ev)
    val b = est(ev.repartition(17, col("event_type")))
    val c = est(ev.orderBy(col("ts").desc))
    assert(a === b && b === c,
      s"estimates must not depend on partitioning or order: $a / $b / $c")
  }
}
