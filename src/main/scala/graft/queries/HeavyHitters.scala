package graft.queries

import graft.functions.HeavyHittersAgg
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The ONE definition of the a19/t15 heavy-hitter construction, so the
  * batch and streaming entries (and their shared oracle) can never
  * desynchronize: the skewed item projection over events, the MG capacity
  * / output threshold pair (capacity 16 ⇒ presence guaranteed above
  * n/17; published threshold n/15), and the exact broadcast-semi-join
  * confirm pass.
  */
object HeavyHitters {

  /** Scale-free skewed item stream over events: 30% of rows land on 3
    * hot items, the rest spread over ~13k cold items — the synthetic
    * columns are near-uniform, so the demo synthesizes its own skew.
    */
  def itemCol: Column =
    when(col("event_id") % 10 < 3,
      concat(lit("hot_"), (col("event_id") % 3).cast("string")))
      .otherwise(concat(lit("cold_"),
        (col("user_id") * 97 + col("event_id") % 89).cast("string")))

  val capacity = 16
  val threshold = 15 // publish items with cnt * threshold > n_total

  def mgSketch = udaf(new HeavyHittersAgg(capacity), Encoders.STRING)

  /** Exact confirm: only candidate rows survive the broadcast semi-join,
    * so the count shuffle carries ≤ capacity distinct keys. `sketch` must
    * have columns (cands: array<string>, n_total: long).
    */
  def confirm(items: DataFrame, sketch: DataFrame): DataFrame = {
    val cand = sketch.select(explode(col("cands")).as("item"), col("n_total"))
    items.join(broadcast(cand), "item")
      .groupBy("item", "n_total").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * threshold > col("n_total"))
      .select("item", "cnt")
  }

  /** The shared DuckDB oracle: exact counts over the same item stream. */
  val oracleSql: String =
    """WITH i AS (SELECT CASE WHEN event_id % 10 < 3
      |             THEN 'hot_' || (event_id % 3)
      |             ELSE 'cold_' || (user_id * 97 + event_id % 89) END AS item
      |           FROM events),
      |n AS (SELECT count(*) AS n_total FROM i),
      |c AS (SELECT item, count(*) AS cnt FROM i GROUP BY 1)
      |SELECT item, CAST(cnt AS BIGINT) AS cnt
      |FROM c, n WHERE cnt * 15 > n_total""".stripMargin
}
