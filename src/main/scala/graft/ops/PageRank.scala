package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an edge list, INTEGER-EXACT so results are
  * bit-reproducible under any partitioning and replayable by a SQL oracle:
  * ranks live in micro-units (bigint, init 1,000,000 per node), each
  * iteration sends `rank div out_degree` along every edge (integer floor
  * division) and refreshes as `150000 + (85 · Σ contributions) div 100` —
  * the 0.15/0.85 damping in integer arithmetic. Integer sums are
  * order-independent, so there is no float-accumulation-order hazard
  * (the a16 moments argument applied to an iterative algorithm).
  *
  * Scale shape: one `groupBy(dst)` shuffle per iteration, partial-sum
  * combinable map-side; the degree table joins by the same key the edges
  * already carry. Lineage is cut per round with a lazy localCheckpoint
  * (the `Components` discipline) so iteration N does not replay rounds
  * 1..N-1.
  *
  * Dangling nodes (no out-edges) contribute nothing — their mass is
  * dropped, not redistributed, so the rank vector is no longer
  * sum-preserving (ordering is unaffected for the connected part).
  * Callers who need the classic normalization should symmetrize the edge
  * list (the `g1_pagerank` query unions each edge with its reverse, which
  * also guarantees no dangling nodes exist at all).
  */
object PageRank {

  /** Personalized PageRank (g8): identical integer arithmetic to [[run]]
    * but the teleport mass lands ONLY on `sources` — r₀ is 1,000,000 on
    * sources / 0 elsewhere, and each refresh adds the 150,000 teleport
    * term only on sources. Ranks then measure proximity TO the source
    * set (the recommendation / trust-propagation form) instead of global
    * centrality; nodes unreachable from every source stay at exactly 0.
    * `sources` is one `node` column; ids not present in the graph are
    * ignored (the flag joins onto the edge-derived node table).
    */
  def runPersonalized(edges: DataFrame, sources: DataFrame, iterations: Int,
                      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val e = edges.select(col(srcCol), col(dstCol)).localCheckpoint(false)
    val deg = e.groupBy(srcCol).agg(count(lit(1)).as("_deg"))
      .localCheckpoint(false)
    val nodes = e.select(col(srcCol).as("node"))
      .union(e.select(col(dstCol).as("node")))
      .distinct()
      .join(sources.select(col("node")).distinct()
        .withColumn("_isrc", lit(1)), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("_isrc"), lit(0)).as("_isrc"))
      .localCheckpoint(false)

    // loop-invariant: (src, dst, out-degree) never changes across
    // iterations — join it ONCE instead of once per round
    val ed = e.join(deg, srcCol).localCheckpoint(false)
    var ranks = nodes.select(col("node"),
      (col("_isrc") * 1000000L).as("rank_micro"))
    for (_ <- 0 until iterations) {
      val contrib = ed
        .join(ranks.withColumnRenamed("node", srcCol), srcCol)
        .select(col(dstCol).as("node"),
          expr("rank_micro div _deg").as("_c"))
      val in = contrib.groupBy("node").agg(sum(col("_c")).as("_s"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          expr("CAST(_isrc * 150000 + (85 * coalesce(_s, 0)) div 100 AS BIGINT)")
            .as("rank_micro"))
        .localCheckpoint(false)
    }
    ranks
  }

  def run(edges: DataFrame, iterations: Int,
          srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val reserved = Seq("node", "rank_micro", "_deg", "_c", "_s")
    val clash = Seq(srcCol, dstCol).filter(reserved.contains)
    require(clash.isEmpty, s"reserved column name(s): ${clash.mkString(",")}")

    // the edge list feeds degree, nodes, AND every iteration's contrib
    // join — cut its lineage once so an expensive upstream (a join +
    // distinct in g1's case) doesn't replay iterations+2 times
    val e = edges.select(col(srcCol), col(dstCol)).localCheckpoint(false)
    // degrees never change across iterations — cut their lineage once so
    // the per-round plan doesn't re-scan + re-aggregate the edge list
    val deg = e.groupBy(srcCol).agg(count(lit(1)).as("_deg"))
      .localCheckpoint(false)
    val nodes = e.select(col(srcCol).as("node"))
      .union(e.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint(false)

    // loop-invariant: (src, dst, out-degree) never changes across
    // iterations — join it ONCE instead of once per round
    val ed = e.join(deg, srcCol).localCheckpoint(false)
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 0 until iterations) {
      val contrib = ed
        .join(ranks.withColumnRenamed("node", srcCol), srcCol)
        .select(col(dstCol).as("node"),
          expr("rank_micro div _deg").as("_c"))
      val in = contrib.groupBy("node").agg(sum(col("_c")).as("_s"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          expr("CAST(150000 + (85 * coalesce(_s, 0)) div 100 AS BIGINT)")
            .as("rank_micro"))
        .localCheckpoint(false)
    }
    ranks
  }
}
