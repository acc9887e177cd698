package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SkewReport on crafted distributions — every output field has a
  * closed-form expectation, so this pins the arithmetic, the tie
  * handling on the top-key probe, and the uniform ⇒ exactly 1,000,000
  * micro-ratio contract.
  */
class SkewReportSpec extends SparkSpec {

  import spark.implicits._

  test("hot-key distribution: all fields exact") {
    // key 7 → 90 rows, keys 0..9 except 7 → 10 rows each: 180 rows,
    // mean 18, max 90 → ratio 5.0
    val rows = (0 until 90).map(_ => 7L) ++
      (0 until 9).flatMap(k => Seq.fill(10)(if (k >= 7) k + 1L else k.toLong))
    val got = SkewReport.keyStats(rows.toDF("k"), "k").collect().head
    assert(got.getAs[Long]("n_rows") === 180L)
    assert(got.getAs[Long]("n_keys") === 10L)
    assert(got.getAs[Long]("max_cnt") === 90L)
    assert(got.getAs[Double]("p50_cnt") === 10.0)
    assert(got.getAs[Long]("top_key") === 7L)
    assert(got.getAs[Long]("skew_ratio_micro") === 5000000L)
  }

  test("uniform distribution reports exactly 1.0 ratio; top-key ties break low") {
    val rows = (0L until 5L).flatMap(k => Seq.fill(20)(k))
    val got = SkewReport.keyStats(rows.toDF("k"), "k").collect().head
    assert(got.getAs[Long]("skew_ratio_micro") === 1000000L)
    assert(got.getAs[Long]("top_key") === 0L, "ties must break to the smallest key")
    assert(got.getAs[Double]("p99_cnt") === 20.0)
  }
}
