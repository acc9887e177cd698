package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a duplicate-pair graph: the step that turns
  * near-dup PAIRS (Jaccard / SimHash / embedding) into dedup CLUSTERS with
  * one survivor each — the reference's merge-group construction
  * (find_duplicates.py:28-31) runs this on the driver over tiny pair sets;
  * at corpus scale the graph must stay distributed.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min label in its closed
  * neighborhood; converges in O(graph diameter) rounds. Near-dup graphs
  * are dense clusters with tiny diameters (2-3), so the round count stays
  * small at any corpus size — the classic alternative for high-diameter
  * graphs (large-star/small-star) costs the same per round and only wins
  * on chain-shaped graphs that dedup clusters don't produce.
  *
  * Each round is one shuffle join + one aggregation; intermediate labels
  * are persisted and the lineage cut per round (localCheckpoint) so the
  * plan doesn't grow exponentially with iterations. Convergence detection
  * rides the same aggregation: each node's own row carries its previous
  * label through the min-agg, so "did anything change" is a filter+count
  * over the checkpointed round output — no second O(V) join per round.
  */
object Components {

  /** @param edges two-column DataFrame of undirected edges (id1, id2)
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          id1: String = "id1", id2: String = "id2"): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col(id1).as("src"), col(id2).as("dst"))
      .union(edges.select(col(id2).as("src"), col(id1).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
        .localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // min over the closed neighborhood: own label ∪ neighbors' labels.
        // Own rows carry their current label in `old` (neighbors carry a
        // typed null, which min() ignores), so the previous label survives
        // the aggregation and change detection is a local filter+count.
        val own = labels.select(col("id"), col("component"),
          col("component").as("old"))
        val viaEdges = sym.join(labels, sym("dst") === labels("id"))
          .select(col("src").as("id"), col("component"),
            when(lit(false), col("component")).as("old"))
        val next = own.unionByName(viaEdges)
          .groupBy("id")
          .agg(min(col("component")).as("component"), min(col("old")).as("old"))
          .localCheckpoint(true)
        val changed = next.filter(col("component") =!= col("old")).count()
        labels = next.select("id", "component")
        converged = changed == 0
        iter += 1
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds")
      labels
    } finally sym.unpersist()
  }

  /** Dedup clusters from near-dup pairs: survivor = min id per component,
    * one row per component with its member list (the distributed analog of
    * find_duplicates.py's merge groups).
    */
  def dedupClusters(edges: DataFrame, id1: String = "id1",
                    id2: String = "id2"): DataFrame =
    connectedComponents(edges, id1 = id1, id2 = id2)
      .groupBy("component")
      .agg(sort_array(collect_list(col("id"))).as("members"),
        count(lit(1)).as("n_members"))
      .select(col("component").as("survivor"), col("members"), col("n_members"))
}
