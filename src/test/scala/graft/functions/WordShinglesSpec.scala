package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** WordShingles (native one-pass byte kernel) must be EXACTLY the
  * higher-order chain it replaces —
  * array_distinct(transform(sequence(0, size(words)−n),
  *   i → array_join(slice(words, i+1, n), ' '))) over split(text, ' ') —
  * including Java split's empty-token semantics (consecutive / leading /
  * trailing spaces, the empty string) and array_distinct's
  * first-occurrence order. Dedup.shingleSets forks on the extension being
  * installed, so any drift here silently changes every d-family oracle.
  */
class WordShinglesSpec extends SparkSpec {

  private def hof(n: Int) = {
    val words = split(col("text"), " ")
    array_distinct(transform(sequence(lit(0), size(words) - n),
      i => array_join(slice(words, i + 1, lit(n)), " ")))
  }

  private def native(n: Int) =
    call_function("graft_shingles", col("text"), lit(n))

  private def check(texts: Seq[String], n: Int): Unit = {
    import spark.implicits._
    // the HOF form is only defined on rows passing the callers' guard
    val df = texts.toDF("text")
      .where(size(split(col("text"), " ")) >= n)
      .select(col("text"), hof(n).as("want"), native(n).as("got"))
    val rows = df.collect()
    for (r <- rows) {
      assert(r.getSeq[String](2) == r.getSeq[String](1),
        s"n=$n text=${r.getString(0)}")
    }
  }

  test("native function is registered on the session") {
    assert(spark.catalog.functionExists("graft_shingles"))
  }

  test("matches the HOF form on edge-case texts") {
    val texts = Seq(
      "a b c d e",
      "a a a a a a",               // dedup to one shingle
      "a  b c",                    // consecutive spaces -> empty token
      " a b c",                    // leading space -> leading empty token
      "a b c ",                    // trailing space -> trailing empty token
      "   ",                       // only spaces -> 4 empty tokens
      "", "x", "x y",              // under-length (filtered by the guard)
      "héllo wörld déjà vu über",  // multi-byte UTF-8
      "a b a b a b a b",           // repeating pattern
      "tab\tand b c",              // non-space whitespace is NOT a separator
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    for (n <- Seq(1, 2, 3, 5)) check(texts, n)
  }

  test("matches the HOF form on random texts") {
    val rng = new Random(41)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "", "ffff", "g")
    val texts = (0 until 300).map { _ =>
      (0 until rng.nextInt(30)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    }
    for (n <- Seq(1, 3)) check(texts, n)
  }

  test("null text yields null, short text an absent row under the guard") {
    import spark.implicits._
    val got = Seq[String](null, "one two", "one two three")
      .toDF("text")
      .select(native(3).as("s"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[String](0).isEmpty)
    assert(got(2).getSeq[String](0) == Seq("one two three"))
  }
}
