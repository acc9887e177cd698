package graft.ops

import graft.SparkSpec

/** Convergent multi-source BFS (g6): exact distances on a hand-built
  * graph, unreachable-absent contract, multi-source min semantics, and
  * round accounting (rounds = eccentricity from the sources + the
  * confirming no-change round).
  */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  private def srcs(ids: Long*) = ids.toDF("node")

  test("path graph: exact hop distances, rounds = eccentricity + 1") {
    // 1–2–3–4–5–6, source 1 → dist = node − 1, eccentricity 5
    val e = edges((1L to 5L).map(i => (i, i + 1)): _*)
    val (dist, rounds) = Bfs.distances(e, srcs(1L))
    val d = dist.as[(Long, Long)].collect().toMap
    assert(d === (1L to 6L).map(i => i -> (i - 1)).toMap)
    assert(rounds == 6, s"5 expansion rounds + 1 confirming, got $rounds")
  }

  test("multi-source: each node gets the distance to its NEAREST source") {
    // path 1..6 with sources at both ends
    val e = edges((1L to 5L).map(i => (i, i + 1)): _*)
    val d = Bfs.distances(e, srcs(1L, 6L))._1.as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("unreachable nodes are absent; a cycle does not loop the iteration") {
    // triangle 1-2-3 (with source) ∪ disconnected edge 10-11
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val (dist, rounds) = Bfs.distances(e, srcs(1L))
    val d = dist.as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    assert(rounds == 2, s"one expansion + one confirm on a triangle, got $rounds")
  }

  test("duplicate source rows neither distort convergence nor the result") {
    // the r5 review scenario: sources [1, 1] on path 1–2–3 made the old
    // count-based convergence check stop after round 1 (dedup shrank the
    // set by exactly the expansion's growth) and silently drop node 3
    val e = edges((1L, 2L), (2L, 3L))
    val dup = Seq(1L, 1L).toDF("node")
    val d = Bfs.distances(e, dup)._1.as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("empty source set converges immediately") {
    val e = edges((1L, 2L))
    val (dist, rounds) = Bfs.distances(e, srcs())
    assert(dist.count() == 0L && rounds == 0)
  }
}
