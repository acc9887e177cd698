package graft.llm

import graft.SparkSpec

/** Distributed connected components: chains, separate clusters, and the
  * cluster summary (survivor = min id).
  */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("chains collapse to one component across rounds; clusters stay separate") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), clique 10-11-12,
    // pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id1", "id2")
    val got = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupClusters summarizes members and survivor per component") {
    val edges = Seq((5L, 3L), (3L, 9L), (100L, 101L)).toDF("id1", "id2")
    val got = Components.dedupClusters(edges).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    assert(got == Set((3L, Seq(3L, 5L, 9L), 3L), (100L, Seq(100L, 101L), 2L)))
  }

  test("non-convergence inside maxIter fails loudly") {
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalArgumentException] {
      Components.connectedComponents(edges, maxIter = 2)
    }
  }
}
