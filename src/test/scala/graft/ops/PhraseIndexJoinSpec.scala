package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PhraseIndexJoinSpec extends SparkSpec {

  import spark.implicits._

  // adversarial corpus: partial-word overlaps, repeated grams, short docs
  private lazy val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "xthe quick brown fox jumpsy and more words here",   // w1 suffix / w5 prefix
    3L -> "quick brown fox",                                    // inner words only
    4L -> "the quick brown the quick brown fox jumps twice",    // repeated gram
    5L -> "unrelated text entirely different content",
    6L -> "tiny doc",
    7L -> "brown fox jumps over something"
  ).toDF("doc_id", "text")

  private def naive(probe: DataFrame): Set[(Long, Long)] =
    probe.join(corpus.select(col("doc_id").as("other_id"), col("text")),
        col("text").contains(col("phrase")))
      .select("doc_id", "other_id").as[(Long, Long)].collect().toSet

  private def indexed(probe: DataFrame): Set[(Long, Long)] =
    PhraseIndexJoin.containsJoin(probe,
        corpus.select(col("doc_id").as("other_id"), col("text")),
        "doc_id", "phrase", "other_id", "text")
      .as[(Long, Long)].collect().toSet

  test("index route matches the nested loop exactly, including partial-word hits") {
    // 5-word phrase: doc 2 contains it only with w1/w5 merged into longer
    // words — the partial-word case the inner-gram key must still catch
    val probe = Seq(10L -> "the quick brown fox jumps").toDF("doc_id", "phrase")
    val expected = naive(probe)
    assert(expected === Set((10L, 1L), (10L, 2L), (10L, 4L)), "fixture sanity")
    assert(indexed(probe) === expected)
  }

  test("repeated gram in one document yields one pair, not duplicates") {
    val probe = Seq(11L -> "a the quick brown b").toDF("doc_id", "phrase")
    val got = PhraseIndexJoin.containsJoin(probe,
        corpus.select(col("doc_id").as("other_id"), col("text")),
        "doc_id", "phrase", "other_id", "text")
      .as[(Long, Long)].collect().toList
    assert(got.size === got.distinct.size, s"duplicate pairs: $got")
  }

  test("3- and 4-word phrases route through shorter inner grams") {
    val probe = Seq(12L -> "quick brown fox",            // inner gram: "brown"
                    13L -> "quick brown fox jumps")      // inner: "brown fox"
      .toDF("doc_id", "phrase")
    assert(indexed(probe) === naive(probe))
  }

  test("short phrases (<3 words) fall back to the loop and stay exact") {
    val probe = Seq(14L -> "brown fox", 15L -> "tiny", 16L -> "")
      .toDF("doc_id", "phrase")
    assert(indexed(probe) === naive(probe))
  }

  test("shorter-than-needed innerLens clamps to a superset key and stays exact") {
    // maxLen = 2 < k − 2 = 3: the key clamps to the 2-gram prefix of the
    // inner words — more candidates, same verified result
    val probe = Seq(17L -> "the quick brown fox jumps").toDF("doc_id", "phrase")
    val got = PhraseIndexJoin.containsJoin(probe,
        corpus.select(col("doc_id").as("other_id"), col("text")),
        "doc_id", "phrase", "other_id", "text", innerLens = Seq(1, 2))
      .as[(Long, Long)].collect().toSet
    assert(got === naive(probe))
  }

  test("a gap below max(innerLens) raises instead of dropping matches") {
    // 4-word phrase needs len 2; only len 3 is indexed → loud failure
    val probe = Seq(18L -> "quick brown fox jumps").toDF("doc_id", "phrase")
    val ex = intercept[Exception] {
      PhraseIndexJoin.containsJoin(probe,
        corpus.select(col("doc_id").as("other_id"), col("text")),
        "doc_id", "phrase", "other_id", "text", innerLens = Seq(3))
        .collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("innerLens missing length")),
      s"unexpected failure: $ex")
  }

  test("the index path plans equi joins — no nested loop, no cartesian") {
    val ph = Seq(18L -> "the quick brown fox jumps").toDF("doc_id", "phrase")
      .select(col("doc_id").as("_pid"), col("phrase").as("_phrase"))
      .withColumn("_pw", split(col("_phrase"), " "))
      .withColumn("_k", size(col("_pw")))
    val c = corpus.select(col("doc_id").as("_cid"), col("text").as("_text"))
    val plan = PhraseIndexJoin.indexMatches(ph, c, Seq(1, 2, 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"index path degraded to a loop:\n$plan")
  }
}
