package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** TopKAgg (bounded per-group top-k) against the window row_number
  * formulation it replaces at scale, plus pure merge-order determinism.
  */
class TopKAggSpec extends SparkSpec {

  private def windowTopK(rows: Seq[(String, Long, Long)], k: Int): Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    rows.toDF("g", "score", "id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("g", "rank", "score", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  private def aggTopK(rows: Seq[(String, Long, Long)], k: Int): Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    rows.toDF("g", "score", "id")
      // many partitions so map-side partials + merges really happen
      .repartition(7)
      .groupBy("g")
      .agg(topk(col("score"), col("id")).as("_topk"))
      .select(col("g"), posexplode(col("_topk")))
      .select(col("g"), (col("pos") + 1).cast("long"), col("col.score"), col("col.id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("matches window row_number on random data with heavy score ties") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val k = trial // k=1..3
      val rows = (1L to 500L).map { id =>
        (s"g${rnd.nextInt(5)}", rnd.nextInt(10).toLong, id) // 10 scores → ties
      }
      assert(aggTopK(rows, k) === windowTopK(rows, k), s"k=$k")
    }
  }

  test("groups smaller than k emit all their rows, ranked") {
    val rows = Seq(("a", 5L, 1L), ("a", 9L, 2L), ("b", 1L, 3L))
    assert(aggTopK(rows, 10) === windowTopK(rows, 10))
  }

  test("plan does map-side partial aggregation (bounded shuffle payload)") {
    import spark.implicits._
    val topk = udaf(new TopKAgg(3), Encoders.product[Scored])
    val plan = Seq(("a", 1L, 1L)).toDF("g", "score", "id")
      .groupBy("g").agg(topk(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    // partial_topkagg BEFORE the exchange = each task forwards ≤ k rows per
    // group; without it the window-sort cost profile would be back
    assert(plan.contains("partial_topkagg"), plan.take(800))
  }

  test("pure reduce/merge is insertion-order independent and bounded") {
    val agg = new TopKAgg(4)
    val items = (1L to 100L).map(i => Scored(i % 7, i))
    val orders = Seq(items, items.reverse, new Random(1).shuffle(items))
    val results = orders.map(_.foldLeft(agg.zero)(agg.reduce))
    assert(results.forall(_.length == 4))
    assert(results.map(_.toSeq).distinct.size === 1)
    // split-merge equals sequential
    val (l, r) = items.splitAt(37)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq === results.head.toSeq)
  }
}
