package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew diagnosis (s26) — the measurement you run BEFORE
  * choosing a skew strategy ([[SkewJoin.salted]] vs the AQE twin vs a
  * plain shuffle): per-key row counts reduced to one report row —
  * total rows, distinct keys, max/median/p99 per-key counts, the
  * hottest key, and `skew_ratio_micro` = max ÷ mean in micro-units
  * (1,000,000 = perfectly uniform). A ratio in the tens means the
  * hottest reducer gets tens of partitions' worth of one key — the
  * number that justifies salting before a job ships, instead of a
  * post-mortem on a straggler task.
  *
  * Scale shape: ONE map-side-combinable groupBy over the key, then a
  * single-row aggregate over the (tiny) per-key count table and a
  * LIMIT-1 top-key probe that broadcasts. The source is scanned once,
  * only (key, count) rows shuffle.
  */
object SkewReport {

  def keyStats(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // two consumers: the rollup and the top-key probe
    val top = counts.orderBy(col("n").desc, col("k")).limit(1)
      .select(col("k").as("top_key"))
    counts
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_cnt"),
        round(expr("percentile(n, 0.5)"), 4).as("p50_cnt"),
        round(expr("percentile(n, 0.99)"), 4).as("p99_cnt"),
        round(max(col("n")) * 1000000.0 * count(lit(1)) / sum(col("n")))
          .cast("long").as("skew_ratio_micro"))
      .crossJoin(broadcast(top))
      .select("n_rows", "n_keys", "max_cnt", "p50_cnt", "p99_cnt",
        "top_key", "skew_ratio_micro")
  }
}
