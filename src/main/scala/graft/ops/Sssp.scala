package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convergent multi-source weighted shortest paths (min-plus Bellman-Ford)
  * over a symmetric weighted edge list (s, t, w ≥ 0): each round relaxes
  * ONLY edges out of nodes whose label improved in the previous round —
  * the weighted analogue of [[Bfs]]'s frontier delta. A node whose label
  * did not change cannot improve any neighbour this round (its outgoing
  * relaxations were already applied the last time it changed), so the
  * worklist discipline reaches the same fixpoint as full re-relaxation
  * while crossing each edge only when its tail actually improves. The
  * fixpoint is THE shortest-distance labelling.
  *
  * Unlike unit-weight BFS, a weighted label can improve MANY times (first
  * touch is not final — a longer-hop lighter path may arrive later), so
  * the delta set is "improved labels", not "newly discovered nodes", and
  * the round count is bounded by the maximum hop count of any shortest
  * path (≤ V−1 in adversarial theory; single digits on the co-purchase
  * graph family — measured in SsspSpec), not the hop eccentricity.
  * After round r the labels equal the min over all ≤ r-edge paths — the
  * same prefix-optimal invariant synchronous Bellman-Ford has, which is
  * what lets g7b's oracle replay N full relaxation rounds and meet the
  * convergent operator exactly whenever N ≥ final-round − 1.
  *
  * Per round: one changed⋈edges join + map-side-combinable min, one left
  * join against the current labels isolating STRICT improvements, one
  * min-merge into the labels; lineage cut per round; one count() action
  * (the changed set only — the label table is never counted). Unreachable
  * nodes are ABSENT from the result, as in [[Bfs]].
  */
object Sssp {

  /** Weighted distances from `sources` (a (node) frame, deduplicated
    * here) over `sym` — a DIRECTED weighted edge list (s, t, w); pass
    * both orientations for an undirected graph. Returns ((node, dist),
    * rounds) where rounds includes the final no-improvement confirmation
    * round. Fails loudly rather than truncating (the g4b/g6 discipline):
    * a maxRounds exit would return non-shortest labels that look exactly
    * like the real thing.
    */
  def distances(sym: DataFrame, sources: DataFrame,
                maxRounds: Int = 100): (DataFrame, Int) = {
    var dist = sources.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("d"))
      .localCheckpoint(false)
    var changed = dist
    var nc = changed.count()
    var rounds = 0
    while (nc > 0 && rounds < maxRounds) {
      val cand = changed.join(sym, changed("node") === sym("s"))
        .select(col("t").as("node"), (col("d") + col("w")).as("d"))
        .groupBy("node").agg(min(col("d")).as("d"))
      val improved = cand
        .join(dist.select(col("node"), col("d").as("_cur")), Seq("node"), "left")
        .filter(col("_cur").isNull || col("d") < col("_cur"))
        .select("node", "d")
        .localCheckpoint(false)
      nc = improved.count()
      rounds += 1
      if (nc > 0) {
        dist = dist.unionByName(improved)
          .groupBy("node").agg(min(col("d")).as("d"))
          .localCheckpoint(false)
        changed = improved
      }
    }
    require(nc == 0,
      s"SSSP did not converge within $maxRounds rounds ($nc labels still improving) — raise maxRounds")
    (dist.select(col("node"), col("d").as("dist")), rounds)
  }
}
