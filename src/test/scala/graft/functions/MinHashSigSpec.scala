package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** MinHashSig (native kernel over spark-catalyst XXH64 statics) must be
  * BIT-identical to the higher-order form it replaces:
  * signature[i] = array_min(transform(transform(set, s → xxhash64(s)),
  * h → xxhash64(h, i))). Dedup.minhashSignatures forks on the extension
  * being installed, so drift here silently changes every LSH bucket
  * (d3/d12/d18/t12/t38) — the verify stage would still make results
  * exact, but the candidate sets and persisted index contents must not
  * move between the two forms.
  */
class MinHashSigSpec extends SparkSpec {

  private def hofSignature(k: Int) = {
    val hs = transform(col("set"), s => xxhash64(s))
    array((0 until k).map(i =>
      array_min(transform(hs, h => xxhash64(h, lit(i))))): _*)
  }

  test("native function is registered on the session") {
    assert(spark.catalog.functionExists("graft_minhash"))
  }

  test("matches the HOF signature on random shingle sets, bit for bit") {
    import spark.implicits._
    val rng = new Random(91)
    val vocab = Vector("alpha", "beta", "gamma delta", "", "héllo", "x y z",
      "the quick brown", "fox")
    val rows = (0 until 150).map { _ =>
      (0 until (1 + rng.nextInt(12)))
        .map(_ => vocab(rng.nextInt(vocab.size))).distinct
    }
    for (k <- Seq(1, 8, 64)) {
      val got = rows.toDF("set")
        .select(call_function("graft_minhash", col("set"), lit(k)).as("sig"),
          hofSignature(k).as("want"))
        .collect()
      for (r <- got)
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k")
    }
  }

  test("empty set yields the all-null signature the HOF form produces") {
    import spark.implicits._
    val r = Seq(Seq.empty[String]).toDF("set")
      .select(call_function("graft_minhash", col("set"), lit(4)).as("sig"),
        hofSignature(4).as("want"))
      .collect()(0)
    assert(r.getSeq[Any](0) == Seq(null, null, null, null))
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
  }
}
