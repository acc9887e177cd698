package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Graph-scale probe, the [[Stress]] discipline applied to the iterative
  * graph family: run integer-exact PageRank over an N×-replicated
  * customer↔supplier trade graph and ASSERT (not eyeball) that every
  * replica of a node lands on the IDENTICAL rank — disjoint copies of
  * the same component must produce the same fixed arithmetic, so any
  * divergence is a partitioning/ordering bug surfacing only at volume.
  * Prints per-stage wall times so round-over-round scaling is recorded.
  *
  * Usage: runMain graft.StressGraph [replicas] [sfDir]
  */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    require(replicas >= 1, s"replicas must be >= 1: $replicas")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def stage[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-graph] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val eo = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.t(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val base = eo.unionByName(
      eo.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false)

    val nEdges = stage("base edges")(base.count())
    // stride from the data, never a constant (the Stress lesson)
    val stride = base.agg(greatest(max("src"), max("dst"))).head.getLong(0) + 1
    val graph = (0 until replicas).map { k =>
      if (k == 0) base
      else base.select((col("src") + k * stride).as("src"),
        (col("dst") + k * stride).as("dst"))
    }.reduce(_ unionByName _)
    println(s"[stress-graph] graph: $nEdges edges x $replicas replicas" +
      s" (stride $stride)")

    val (ranks, nNodes) = stage("pagerank 3 iters") {
      val r = PageRank.run(graph, iterations = 3)
      (r, r.count()) // materialize through the lazy checkpoints
    }

    stage("replica equality") {
      // every base node must have exactly ONE distinct rank across all
      // of its replicas — and every base node must appear in all copies
      val bad = ranks
        .groupBy((col("node") % stride).as("base_node"))
        .agg(countDistinct(col("rank_micro")).as("nr"),
          count(lit(1)).as("copies"))
        .filter(col("nr") =!= 1 || col("copies") =!= replicas)
        .count()
      require(bad == 0, s"$bad base nodes diverged across replicas")
    }

    println(s"[stress-graph] OK: $nNodes nodes, identical ranks across " +
      s"$replicas disjoint copies")

    // ---- triangles at volume: replicate the CO-PURCHASE projection (the
    // trade graph is bipartite — triangle-free by construction) and assert
    // the degree-oriented enumeration lands every replica of a node on
    // the identical count. Orientation ties break by (degree, id) and ids
    // shift by stride per replica, but degrees replicate exactly, so the
    // per-copy tie-break order — and therefore the enumeration — is
    // isomorphic across copies; divergence means the intersection kernel
    // or the orientation leaked partitioning order.
    val ce = graft.ops.Triangles.coPurchaseEdges(
      Tables.t(spark, sfDir, "lineitem"))
    val nCo = stage("co-purchase edges")(ce.count())
    val cStride = ce.agg(greatest(max("u"), max("v"))).head.getLong(0) + 1
    val coGraph = (0 until replicas).map { k =>
      if (k == 0) ce
      else ce.select((col("u") + k * cStride).as("u"),
        (col("v") + k * cStride).as("v"))
    }.reduce(_ unionByName _).localCheckpoint(false)
    println(s"[stress-graph] co-purchase: $nCo edges x $replicas replicas")

    val triCounts = stage("triangles (deg-oriented)") {
      val r = graft.ops.Triangles.perNodeCounts(
        graft.ops.Triangles.orientByDegree(coGraph))
      r.localCheckpoint(true)
    }
    stage("triangle replica equality") {
      val bad = triCounts
        .groupBy((col("node") % cStride).as("base_node"))
        .agg(countDistinct(col("n_triangles")).as("nc"),
          count(lit(1)).as("copies"))
        .filter(col("nc") =!= 1 || col("copies") =!= replicas)
        .count()
      require(bad == 0, s"$bad base nodes diverged across replicas")
    }
    println(s"[stress-graph] OK: identical per-node triangle counts " +
      s"across $replicas disjoint copies")
    spark.stop()
  }
}
