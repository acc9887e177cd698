package graft.functions

import graft.SparkSpec
import graft.llm.TextStats
import org.apache.spark.sql.functions._

import scala.util.Random

/** KGramFold31 (rolling O(n) native) must be bit-identical to the
  * higher-order O(n·k) fold it replaces, and winnowPortable must not
  * change output when the native path kicks in.
  */
class KGramFold31Spec extends SparkSpec {

  /** Driver-side reference: direct (non-rolling) fold per window. */
  private def reference(codes: Seq[Long], k: Int): Seq[Long] =
    if (codes.length < k) Seq.empty
    else codes.sliding(k).map(_.foldLeft(0L)((a, c) => (a * 31 + c) % 2147483648L)).toSeq

  test("native function is registered on the session") {
    assert(spark.catalog.functionExists("graft_kgram31"))
  }

  test("matches the direct fold on random code arrays") {
    import spark.implicits._
    val rng = new Random(17)
    val rows = (0 until 200).map { _ =>
      val n = rng.nextInt(60)
      (0 until n).map(_ => rng.nextInt(128).toLong)
    }
    for (k <- Seq(1, 3, 5, 8)) {
      val got = rows.toDF("codes")
        .select(call_function("graft_kgram31", col("codes"), lit(k)).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      val want = rows.map(r => reference(r, k))
      assert(got.toSeq == want, s"k=$k")
    }
  }

  test("short arrays produce an empty result, never garbage") {
    import spark.implicits._
    val got = Seq(Seq.empty[Long], Seq(5L), Seq(5L, 6L))
      .toDF("codes")
      .select(call_function("graft_kgram31", col("codes"), lit(3)).as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got.toSeq == Seq(Seq.empty, Seq.empty, Seq.empty))
  }

  test("winnowPortable output is unchanged by the native path") {
    import spark.implicits._
    val rng = new Random(23)
    val texts = (0 until 100).map { _ =>
      val n = rng.nextInt(200)
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    } :+ "" :+ "ab"
    val df = texts.toDF("text")
    // the HOF fallback, forced by computing against an explicit transform
    val hof = {
      val cs = transform(filter(split(col("text"), ""), c => c =!= lit("")),
        c => ascii(c).cast("long"))
      val hs = transform(sequence(lit(1), size(cs) - 4 + 1),
        i => aggregate(slice(cs, i, lit(4)), lit(0L),
          (a, c) => (a * 31 + c) % 2147483648L))
      val numWin = (size(hs) / 5).cast("long")
      val mins = transform(sequence(lit(0L), numWin - 1),
        w => array_min(slice(hs, (w * 5 + 1).cast("int"), lit(5))))
      val acc = aggregate(mins, lit(0L), (a, b) => a.bitwiseXOR(b))
      when(col("text").isNull || length(col("text")) < 4 || numWin < 1, lit(0L))
        .otherwise(acc)
    }
    val a = df.select(TextStats.winnowPortable(col("text"), 4, 5).as("f"))
      .collect().map(_.getLong(0)).toSeq
    val b = df.select(hof.as("f")).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
