package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Planted-case coverage for the symmetric-delete edit-distance join:
  * every ed ≤ 1 relation (substitution / insertion / deletion /
  * equality) must pair, shared-variant-but-ed-2 pairs must NOT survive
  * the banded verify, the empty string can't crash variant generation
  * (sequence(0,−1) descends), and the physical plan must stay
  * cartesian-free — the entire point of the blocking scheme.
  */
class EditDistanceJoinSpec extends SparkSpec {

  import spark.implicits._

  /** Reference DP edit distance — the spec's ground truth. */
  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("ed<=1 pairs exactly; transpositions (ed=2) pruned; no cartesian") {
    val rows = Seq(
      (1L, "smith"),   // base
      (2L, "smyth"),   // substitution        → pairs with 1
      (3L, "smiths"),  // insertion           → pairs with 1
      (4L, "smit"),    // deletion            → pairs with 1
      (5L, "smith"),   // equal               → pairs with 1
      (6L, "ab"),      // transposition probe:
      (7L, "ba"),      //   D("ab") ∩ D("ba") = {"a","b"} but ed = 2 → NO pair
      (8L, ""),        // empty string: must not crash, pairs with "a"
      (9L, "a"),       //   (insertion) and with the other empty
      (10L, ""),
      (11L, "zzzzzz")  // isolated — no pairs
    ).toDF("id", "s")

    val out = EditDistanceJoin.ed1Pairs(rows, "id", "s")
    val pairs = out.select("id1", "id2").as[(Long, Long)].collect().toSet
    // ground truth from a reference DP implementation, not a hand list
    val strs = Seq(1L -> "smith", 2L -> "smyth", 3L -> "smiths", 4L -> "smit",
      5L -> "smith", 6L -> "ab", 7L -> "ba", 8L -> "", 9L -> "a", 10L -> "",
      11L -> "zzzzzz")
    val truth = (for {
      (i1, s1) <- strs; (i2, s2) <- strs
      if i1 < i2 && ed(s1, s2) <= 1
    } yield (i1, i2)).toSet
    assert(pairs === truth,
      s"missing: ${(truth -- pairs).toSeq.sorted}; extra: ${(pairs -- truth).toSeq.sorted}")
    assert(!pairs.contains((6L, 7L)), "transposition must be pruned by the verify")
    assert(pairs.contains((1L, 2L)) && pairs.contains((8L, 9L)) &&
      pairs.contains((8L, 10L)), "substitution / empty-insert / empty-equal present")

    val plan = out.queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      "candidate generation must never degrade to a cartesian product")
  }

  test("ed<=2 PassJoin: subs/indels/transpositions in, ed=3 out, tiny strings covered") {
    val rows = Seq(
      (1L, "warehouse"),    // base
      (2L, "warehouze"),    // 1 substitution
      (3L, "warehuze"),     // substitution + deletion (ed 2 vs 1)
      (4L, "wharehouse"),   // 1 insertion
      (5L, "awrehouse"),    // transposition (ed 2) — ed1Pairs misses it
      (6L, "distribute"),   // far away
      (7L, "warehXuzY"),    // ed 3 from 1 — must be EXCLUDED
      (8L, "ab"),           // tiny×tiny leg
      (9L, "ba"),           //   ed("ab","ba") = 2 → pair
      (10L, "abcd"),        // tiny-vs-segmentable: ed("ab","abcd") = 2
      (11L, "")             // empty: ed 2 to "ab"/"ba", 4 to "abcd"
    ).toDF("id", "s")
    val strs = Seq(1L -> "warehouse", 2L -> "warehouze", 3L -> "warehuze",
      4L -> "wharehouse", 5L -> "awrehouse", 6L -> "distribute",
      7L -> "warehXuzY", 8L -> "ab", 9L -> "ba", 10L -> "abcd", 11L -> "")

    val pairs = EditDistanceJoin.ed2Pairs(rows, "id", "s")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val truth = (for {
      (i1, s1) <- strs; (i2, s2) <- strs
      if i1 < i2 && ed(s1, s2) <= 2
    } yield (i1, i2)).toSet
    assert(pairs === truth,
      s"missing: ${(truth -- pairs).toSeq.sorted}; extra: ${(pairs -- truth).toSeq.sorted}")
    assert(pairs.contains((1L, 5L)) && !pairs.contains((1L, 7L)) &&
      pairs.contains((8L, 9L)) && pairs.contains((8L, 10L)),
      "transposition in, ed-3 out, tiny legs covered")
  }

  test("ed<=2 tiny-string flood expands through chunked form groups, stays exact") {
    // 30 empties + 10 one-char + 5 segmentable: every tiny pair is a true
    // result (ed <= max len <= 2); with maxChunk=4 both the same-form and
    // cross-form legs must route through block pairs and still be exact
    val strs = (0L until 30L).map(i => i -> "") ++
      (30L until 40L).map(i => i -> "a") ++
      (40L until 45L).map(i => i -> s"str$i")
    val pairs = EditDistanceJoin.ed2Pairs(strs.toDF("id", "s"), "id", "s",
      maxChunk = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val truth = (for {
      (i1, s1) <- strs; (i2, s2) <- strs
      if i1 < i2 && ed(s1, s2) <= 2
    } yield (i1, i2)).toSet
    assert(pairs === truth,
      s"tiny flood diverged: missing ${(truth -- pairs).size}, extra ${(pairs -- truth).size}")
    assert(truth.size >= 435 + 300 + 45, s"flood must be pair-dense: ${truth.size}")
  }

  test("ed<=2 chunk guard: hot shared-prefix corpus stays exact at a tiny maxChunk") {
    // every string shares segment 0 ("PRE") → one corpus-sized key; with
    // maxChunk=4 the bipartite expansion MUST route through block pairs,
    // and the result must equal the quadratic truth regardless
    val rows = (0L until 60L).map(i => (i, f"PREFIX-$i%02d")).toDF("id", "s")
    val strs = (0L until 60L).map(i => i -> f"PREFIX-$i%02d")
    val pairs = EditDistanceJoin.ed2Pairs(rows, "id", "s", maxChunk = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val truth = (for {
      (i1, s1) <- strs; (i2, s2) <- strs
      if i1 < i2 && ed(s1, s2) <= 2
    } yield (i1, i2)).toSet
    assert(pairs === truth,
      s"chunked path diverged: missing ${(truth -- pairs).size}, extra ${(pairs -- truth).size}")
    assert(truth.size > 100, s"hot corpus must be pair-dense, got ${truth.size}")
  }
}
