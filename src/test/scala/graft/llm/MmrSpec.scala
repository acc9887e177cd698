package graft.llm

import graft.SparkSpec

import scala.util.Random

/** mmrGreedy: relevance-first start, diversity under planted near-dups,
  * input-order independence, short-candidate-list safety.
  */
class MmrSpec extends SparkSpec {

  private def vec(xs: Double*): Seq[Double] = xs.map(x => math.rint(x * 1000))

  test("first pick is the highest-relevance candidate (id tie-break)") {
    val cands = Seq(
      (5L, 0.9, vec(1, 0)), (3L, 0.9, vec(0, 1)), (7L, 0.5, vec(1, 1)))
    val out = Similarity.mmrGreedy(cands, select = 1, lambda = 0.7, mu = 0.3)
    assert(out.map(_.neighbor_id) == Seq(3L))
    assert(out.head.sel_rank == 1)
  }

  test("diversity: a near-duplicate of the first pick is passed over") {
    // id 1 and 2 are the same direction (near-dups), id 3 orthogonal and
    // slightly less relevant: plain top-2 = {1, 2}; MMR must pick {1, 3}
    val cands = Seq(
      (1L, 0.95, vec(1, 0)),
      (2L, 0.94, vec(1, 0.001)),
      (3L, 0.80, vec(0, 1)))
    val out = Similarity.mmrGreedy(cands, select = 2, lambda = 0.7, mu = 0.3)
    assert(out.map(_.neighbor_id) == Seq(1L, 3L))
  }

  test("result is independent of candidate input order") {
    val rng = new Random(5)
    val cands = (0 until 20).map { i =>
      (i.toLong, rng.nextDouble(),
        vec(rng.nextDouble(), rng.nextDouble(), rng.nextDouble()))
    }
    val a = Similarity.mmrGreedy(cands, 5, 0.7, 0.3)
    val b = Similarity.mmrGreedy(rng.shuffle(cands), 5, 0.7, 0.3)
    assert(a == b)
  }

  test("fewer candidates than select: returns all, ranks contiguous") {
    val cands = Seq((1L, 0.5, vec(1, 0)), (2L, 0.4, vec(0, 1)))
    val out = Similarity.mmrGreedy(cands, select = 5, lambda = 0.7, mu = 0.3)
    assert(out.map(_.sel_rank) == Seq(1, 2))
  }
}
