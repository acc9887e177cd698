package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a canonical undirected edge list
  * (u < v, distinct): synchronous frontier expansion with a min-combine —
  * round k reaches exactly the nodes at hop distance k, so the first
  * label a node ever gets IS its shortest distance (unit weights), and
  * the iteration is CONVERGENT: once a round adds no node, every
  * reachable node holds its final distance (one count() per round, the
  * same fixpoint discipline as [[KCore]]).
  *
  * Shape per round: one edge join from the known set + one
  * map-side-combinable min aggregation; lineage cut per round (the
  * g1/g2/KCore discipline). Unreachable nodes are ABSENT from the result
  * — a left join against the node table surfaces them as null if a
  * caller wants that. Rounds are bounded by graph eccentricity from the
  * source set; a 100×-denser graph gets SHALLOWER, not deeper.
  */
object Bfs {

  /** Hop distances from `sources` (a (node) frame). Returns
    * ((node, dist), rounds) where rounds includes the final confirming
    * no-change round.
    */
  def distances(edges: DataFrame, sources: DataFrame,
                maxRounds: Int = 50): (DataFrame, Int) = {
    val sym = edges.select(col("u").as("s"), col("v").as("t"))
      .unionByName(edges.select(col("v").as("s"), col("u").as("t")))
      .localCheckpoint(false)
    var dist = sources.select(col("node"), lit(0L).as("d"))
      .localCheckpoint(false)
    var n = dist.count()
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val next = dist
        .unionByName(
          dist.join(sym, dist("node") === sym("s"))
            .select(col("t").as("node"), (col("d") + 1).as("d")))
        .groupBy("node").agg(min(col("d")).as("d"))
        .localCheckpoint(false)
      val m = next.count()
      rounds += 1
      converged = m == n
      dist = next
      n = m
    }
    (dist.select(col("node"), col("d").as("dist")), rounds)
  }
}
