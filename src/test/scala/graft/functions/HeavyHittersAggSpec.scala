package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.Random

/** HeavyHittersAgg (mergeable Misra–Gries): the superset guarantee —
  * every item with true count > n/(m+1) is present in the summary — must
  * hold for ANY merge tree, and the sketch+exact-confirm composition must
  * equal brute-force counting.
  */
class HeavyHittersAggSpec extends SparkSpec {

  /** Run the aggregator over `items` split into `chunks` pieces, merging
    * the per-chunk buffers in a random binary tree order.
    */
  private def sketchOver(items: Seq[String], m: Int, chunks: Int,
                         rng: Random): Seq[String] = {
    val agg = new HeavyHittersAgg(m)
    val parts = items.grouped(math.max(1, items.size / chunks)).toBuffer
    var bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    while (bufs.size > 1) {
      val i = rng.nextInt(bufs.size)
      val a = bufs.remove(i)
      val j = rng.nextInt(bufs.size)
      val b = bufs.remove(j)
      bufs += agg.merge(a, b)
    }
    agg.finish(bufs.headOption.getOrElse(agg.zero))
  }

  /** Zipf-ish stream: a few dominant items plus a long uniform tail. */
  private def skewedStream(n: Int, rng: Random): Seq[String] =
    (0 until n).map { _ =>
      val r = rng.nextInt(100)
      if (r < 20) "hot0" else if (r < 35) "hot1" else if (r < 45) "hot2"
      else s"cold${rng.nextInt(500)}"
    }

  test("superset guarantee holds under random merge trees") {
    val rng = new Random(42)
    for (trial <- 0 until 20) {
      val n = 2000 + rng.nextInt(3000)
      val m = 8 + rng.nextInt(24)
      val items = skewedStream(n, rng)
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val mustHave = exact.collect {
        case (k, c) if c > items.size.toLong / (m + 1) => k
      }.toSet
      val cands = sketchOver(items, m, chunks = 1 + rng.nextInt(16), rng).toSet
      assert(mustHave.subsetOf(cands),
        s"trial $trial (n=$n m=$m): missing ${mustHave -- cands}")
      assert(cands.size <= m, s"trial $trial: buffer exceeded capacity")
    }
  }

  test("buffer never exceeds capacity during the stream") {
    val agg = new HeavyHittersAgg(5)
    val rng = new Random(7)
    var buf = agg.zero
    skewedStream(3000, rng).foreach { w =>
      buf = agg.reduce(buf, w)
      assert(buf.size <= 5)
    }
  }

  test("decrement-all retires counters that reach zero") {
    val agg = new HeavyHittersAgg(2)
    var buf = agg.zero
    Seq("a", "b", "c").foreach(w => buf = agg.reduce(buf, w))
    // a and b each decremented to 0 by c's arrival; c never inserted
    assert(buf.isEmpty)
    Seq("a", "a", "b", "c").foreach(w => buf = agg.reduce(buf, w))
    assert(buf == mutable.Map("a" -> 1L))
  }

  test("sketch + exact confirm equals brute-force heavy hitters on Spark") {
    import spark.implicits._
    val rng = new Random(11)
    val items = skewedStream(5000, rng)
    val df = items.toDF("item").repartition(7) // real partial merges
    val mg = udaf(new HeavyHittersAgg(16), Encoders.STRING)
    val sketch = df.agg(mg(col("item")).as("cands"), count(lit(1)).as("n"))
    val cand = sketch.select(explode(col("cands")).as("item"), col("n"))
    val got = df.join(broadcast(cand), "item")
      .groupBy("item", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 15 > col("n"))
      .select("item", "cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet

    val n = items.size.toLong
    val want = items.groupBy(identity).collect {
      case (k, v) if v.size.toLong * 15 > n => k -> v.size.toLong
    }.toSet
    assert(got == want)
  }
}
