package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Convergent weighted SSSP (g7b): exact distances on crafted graphs
  * (including the label-re-improvement case unit-weight BFS cannot
  * express), equivalence against an in-memory Dijkstra on a seeded
  * pseudo-random graph, round accounting, and the convergence-depth
  * measurement that calibrates the g7b oracle's unroll.
  */
class SsspSpec extends SparkSpec {

  import spark.implicits._

  /** Symmetric (s, t, w) from undirected weighted edges. */
  private def wedges(tris: (Long, Long, Long)*) = {
    val e = tris.toDF("u", "v", "w")
    e.select(col("u").as("s"), col("v").as("t"), col("w"))
      .unionByName(e.select(col("v").as("s"), col("u").as("t"), col("w")))
  }

  private def srcs(ids: Long*) = ids.toDF("node")

  test("lighter long-hop path beats the heavy direct edge (label re-improvement)") {
    // 1–2 direct at w=10; detour 1–3–4–2 at w=1 each → dist(2) = 3.
    // Round 1 touches 2 at 10; round 3 improves it to 3 — first touch is
    // NOT final, the exact case g6's unit-weight BFS cannot express.
    val e = wedges((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L))
    val (dist, rounds) = Sssp.distances(e, srcs(1L))
    val d = dist.as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
    assert(rounds == 4, s"3 improving rounds + 1 confirming, got $rounds")
  }

  test("multi-source: each node gets the weighted distance to its nearest source") {
    // path 1–2–3–4–5, all w=2, sources at both ends
    val e = wedges((1L to 4L).map(i => (i, i + 1, 2L)): _*)
    val d = Sssp.distances(e, srcs(1L, 5L))._1.as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 2L, 5L -> 0L))
  }

  test("unreachable nodes are absent; duplicate sources don't distort rounds") {
    val e = wedges((1L, 2L, 5L), (10L, 11L, 1L))
    val d = Sssp.distances(e, Seq(1L, 1L).toDF("node"))._1
      .as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 5L))
  }

  test("empty source set converges immediately") {
    val (dist, rounds) = Sssp.distances(wedges((1L, 2L, 1L)), srcs())
    assert(dist.count() == 0L && rounds == 0)
  }

  test("matches in-memory Dijkstra on a seeded pseudo-random graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val raw = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        (rnd.nextInt(10) + 1).toLong))
      .filter { case (a, b, _) => a != b }
    // keep one weight per undirected pair (min), as a canonical edge list
    val undirected = raw.map { case (a, b, w) =>
      ((math.min(a, b), math.max(a, b)), w)
    }.groupMapReduce(_._1)(_._2)(math.min).toSeq
      .map { case ((a, b), w) => (a, b, w) }
    val sources = Seq(0L, 1L, 2L)

    // reference: multi-source Dijkstra over the adjacency map
    val adj = undirected.flatMap { case (a, b, w) => Seq(a -> (b, w), b -> (a, w)) }
      .groupMap(_._1)(_._2)
    val best = scala.collection.mutable.Map[Long, Long]()
    val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(
      Ordering.by[(Long, Long), Long](_._1).reverse)
    sources.foreach { s => best(s) = 0L; pq.enqueue((0L, s)) }
    while (pq.nonEmpty) {
      val (d0, u) = pq.dequeue()
      if (best(u) == d0)
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (best.get(v).forall(_ > d0 + w)) { best(v) = d0 + w; pq.enqueue((d0 + w, v)) }
        }
    }

    val got = Sssp.distances(wedges(undirected: _*), sources.toDF("node"))._1
      .as[(Long, Long)].collect().toMap
    assert(got === best.toMap)
  }

  test("co-purchase graph convergence depth stays under the g7b oracle unroll") {
    // the g7b entry's exact scope at sf0.001; sf0.01/sf0.1 measured
    // separately (2/3 improving rounds — the slow eccentricity-like
    // upward trend) — all far under the oracle's 12 unrolled
    // relaxations. Recorded here so a depth drift surfaces in CI before
    // the entry guard trips at the driver's scale factor.
    val li = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val ew = Triangles.coPurchaseWeights(li)
      .select(col("u"), col("v"), (lit(11L) - least(col("cnt"), lit(10L))).as("w"))
    val sym = ew.select(col("u").as("s"), col("v").as("t"), col("w"))
      .unionByName(ew.select(col("v").as("s"), col("u").as("t"), col("w")))
      .localCheckpoint(false)
    val sources = sym.select(col("s").as("node")).distinct()
      .orderBy("node").limit(10)
    val (dist, rounds) = Sssp.distances(sym, sources)
    info(s"sf0.001 co-purchase SSSP: ${rounds - 1} improving rounds, " +
      s"${dist.count()} labelled nodes")
    assert(rounds - 1 <= 12, s"convergence depth ${rounds - 1} exceeds the oracle unroll")
    assert(dist.count() > 0)
  }
}
