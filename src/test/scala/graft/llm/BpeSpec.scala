package graft.llm

import graft.SparkSpec

/** Pins [[TextStats.bpeTrain]] on hand-computable corpora — in
  * particular the two places a naive merge implementation diverges from
  * BPE's greedy left-to-right scan:
  *
  *   · OVERLAP: merging (b, b) in `bbb` must yield [bb, b] (leftmost
  *     pair wins, the middle symbol is spent), never [b, bb] or a
  *     double count;
  *   · ABUTTING CHAIN: after round 1 merges (a, b), the word `abab` is
  *     [ab, ab] and round 2's (ab, ab) merge must fire on the abutting
  *     occurrences — the double-separator replace() encoding keeps an
  *     unconsumed boundary separator between them (the scaladoc's case
  *     (b)).
  *
  * Counts are occurrence-WEIGHTED (distinct words carry corpus
  * frequencies), the classic BPE optimization the 100 TB path relies on.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("weighted multi-round merges with abutting-chain re-segmentation") {
    // words: abab x2 (one doc has it twice), abc x1; "a" is filtered
    // (single char can never pair)
    val docs = Seq((1L, "abab abab"), (2L, "abc a")).toDF("doc_id", "text")
    val got = TextStats.bpeTrain(docs, rounds = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toList
    // round 1: pairs (a,b): 2·2 + 1 = 5, (b,a): 2, (b,c): 1 → merge (a,b)
    // round 2: abab = [ab, ab] (chain!), abc = [ab, c] → (ab,ab): 2 wins
    // round 3: only (ab, c): 1 remains
    assert(got === List((1, "a", "b", 5L), (2, "ab", "ab", 2L),
      (3, "ab", "c", 1L)), s"merge table: $got")
  }

  test("overlap: greedy left-to-right spends the shared middle symbol") {
    val docs = Seq((1L, "bbb b")).toDF("doc_id", "text")
    val got = TextStats.bpeTrain(docs, rounds = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toList
    // round 1: (b,b) counted at BOTH positions (cnt 2), merge → [bb, b]
    // round 2: the only remaining pair is (bb, b) — [b, bb] would give
    // (b, bb) instead, and a non-greedy merge would have left 3 symbols
    assert(got === List((1, "b", "b", 2L), (2, "bb", "b", 1L)),
      s"greedy overlap semantics: $got")
  }

  test("boundary safety: a symbol ending in l does not false-merge") {
    // words: "xab" and "ab": round 1 merges (a,b) cnt 2 — in "xab" the
    // merge must apply to the (a,b) SYMBOL pair, yielding [x, ab], not
    // corrupt the x boundary
    val docs = Seq((1L, "xab ab")).toDF("doc_id", "text")
    val got = TextStats.bpeTrain(docs, rounds = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toList
    // round 2: remaining pairs: (x, ab): 1 → merge
    assert(got === List((1, "a", "b", 2L), (2, "ab", "x", 1L)) ||
      got === List((1, "a", "b", 2L), (2, "x", "ab", 1L)),
      s"after (a,b): xab = [x, ab]: $got")
    // the round-2 pair must be (x, ab) — left symbol x, right symbol ab
    assert(got(1)._2 === "x" && got(1)._3 === "ab", s"round-2 pair: $got")
  }

  test("exhausted vocabulary fails loudly instead of returning short") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextStats.bpeTrain(docs, rounds = 2)
    }
    assert(e.getMessage.contains("no pairs remain"))
  }
}
