package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Convergent k-core (g4b). Measured convergence depths on the
  * co-purchase graph, recorded here because the g4b oracle's unroll
  * depth (8) must dominate them:
  *   sf0.01  k=80: 6 rounds → 105,232 of 115,729 edges survive
  *   sf0.1   k=80: 6 rounds → 1,114,197 of 1,196,000 edges survive
  *   sf0.001 k=60: 2 rounds → 8,687 of 8,899 edges survive
  * (k=85 empties the sf0.01 graph in 10 rounds; the graph is
  * near-regular, so non-degeneracy needs k inside the degree band.)
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def edges(pairs: Seq[(Long, Long)]) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  test("deep cascade: path peels one layer per round, clique survives") {
    // path 1–2–…–8 hanging off a 6-clique (nodes 100–105 ∪ edge 8–100):
    // k=2 removes exactly one path node per round (the free end), so the
    // cascade is as deep as the path; the clique (internal degree 5) is
    // the fixpoint.
    val path = (1L to 7L).map(i => (i, i + 1))
    val clique = for {
      a <- 100L to 105L; b <- 100L to 105L if a < b
    } yield (a, b)
    val e = edges(path ++ clique :+ (8L, 100L))
    val (core, rounds) = KCore.peelToFixpoint(e, k = 2)
    val survivors = KCore.coreDegrees(core).as[(Long, Long)].collect().toMap
    assert(survivors.keySet === (100L to 105L).toSet,
      s"core should be exactly the clique, got ${survivors.keySet}")
    assert(survivors.values.forall(_ == 5L))
    assert(rounds >= 8,
      s"peeling an 8-node path one end per round needs ≥8 rounds, got $rounds")
  }

  test("fixpoint is idempotent: re-peeling the core is a single no-op round") {
    val e = Triangles.coPurchaseEdges(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem"))
    val (core, rounds) = KCore.peelToFixpoint(e, k = 60)
    assert(core.count() > 0, "k=60 core at sf0.001 should be non-empty")
    assert(rounds >= 2, s"k=60 at sf0.001 cascades ≥1 real round, got $rounds")
    val degs = KCore.coreDegrees(core)
    assert(degs.agg(min(col("degree"))).as[Long].head() >= 60L,
      "every node in the k-core must keep degree ≥ k")
    val (again, confirmRounds) = KCore.peelToFixpoint(core, k = 60)
    assert(confirmRounds == 1, "re-peeling a fixpoint must confirm in 1 round")
    assert(again.count() == core.count())
  }

  test("empty core: k above the degree band empties the graph, and stays converged") {
    val e = edges((1L to 7L).map(i => (i, i + 1)))
    val (core, _) = KCore.peelToFixpoint(e, k = 3)
    assert(core.count() == 0L)
    // peeling an empty edge list terminates immediately
    val (still, r) = KCore.peelToFixpoint(core, k = 3)
    assert(still.count() == 0L && r == 0)
  }
}
