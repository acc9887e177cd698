package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native graft_dot expression: correctness vs the interpreted
  * higher-order formulation, null propagation, and SQL resolution through
  * GraftExtensions.
  */
class DotProductSpec extends SparkSpec {

  test("graft_dot resolves via extensions and matches the interpreted path") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0)),
      (Array(-1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    val both = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("interpreted"))
    assert(both.filter(col("native") =!= col("interpreted")).count() === 0)
    assert(both.head().getDouble(0) === 32.0)
  }

  test("graft_dot propagates nulls and works from SQL text") {
    import spark.implicits._
    Seq((Array(1.0, 2.0), Option.empty[Array[Double]]))
      .toDF("a", "b").createOrReplaceTempView("dot_null_t")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_null_t").head()
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted eval agree on a large random-ish batch") {
    import spark.implicits._
    val df = spark.range(1000).select(
      transform(sequence(lit(0), lit(63)),
        i => (xxhash64(col("id"), i) % 1000).cast("double")).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => (xxhash64(i, col("id")) % 1000).cast("double")).as("b"))
    val diff = df.select(
        call_function("graft_dot", col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("i"))
      .filter(col("n") =!= col("i"))
    assert(diff.count() === 0)
  }
}
