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
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
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
}
