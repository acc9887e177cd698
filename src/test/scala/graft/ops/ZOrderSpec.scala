package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  // reference Morton code, the scalar way
  private def morton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (j <- 0 until bits; i <- xs.indices)
      z |= (((xs(i) >> j) & 1L) << (j * xs.size + i))
    z
  }

  test("zvalue matches the scalar bit-interleave, 2-D and 3-D") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(col("x"), col("y"),
        ZOrder.zvalue(Seq(col("x"), col("y")), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (x, y, z) => assert(z === morton(Seq(x, y), 8), s"($x,$y)") }
    val got3 = df.select(col("x"), col("y"), col("w"),
        ZOrder.zvalue(Seq(col("x"), col("y"), col("w")), 8).as("z"))
      .collect()
    got3.foreach { r =>
      assert(r.getLong(3) === morton(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8))
    }
  }

  test("zvalue masks out-of-range inputs instead of corrupting high bits") {
    val df = Seq((300L, 2L)).toDF("x", "y") // 300 > 255: only low 8 bits count
    val z = df.select(ZOrder.zvalue(Seq(col("x"), col("y")), 8)).head.getLong(0)
    assert(z === morton(Seq(300L & 255L, 2L), 8))
    assert(z < (1L << 16), "interleaved value must stay within 2*bits")
  }

  // full 256×256 grid → 64 partitions; per-partition min/max = the
  // file-level stats a lakehouse scan would prune with
  private def partitionStats(laid: DataFrame): Array[(Long, Long, Long, Long)] =
    laid.groupBy(spark_partition_id().as("p"))
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .select("minx", "maxx", "miny", "maxy")
      .as[(Long, Long, Long, Long)].collect()

  test("z-layout prunes on the secondary dimension; a 1-D sort cannot") {
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"),
        (col("id") % 256).cast("long").as("y"))
    val zLaid = ZOrder.layout(grid, Seq(col("x"), col("y")), 8, 64)
    val xSorted = grid.repartitionByRange(64, col("x")).sortWithinPartitions("x")

    def touched(stats: Array[(Long, Long, Long, Long)],
                xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int =
      stats.count { case (minx, maxx, miny, maxy) =>
        xr.forall { case (lo, hi) => minx <= hi && maxx >= lo } &&
          yr.forall { case (lo, hi) => miny <= hi && maxy >= lo }
      }

    val zStats = partitionStats(zLaid)
    val xStats = partitionStats(xSorted)
    assert(zStats.length === 64 && xStats.length === 64)

    // y-only predicate (the secondary dim): 16/256 selectivity
    val yOnlyZ = touched(zStats, None, Some((40L, 55L)))
    val yOnlyX = touched(xStats, None, Some((40L, 55L)))
    assert(yOnlyX === 64, "1-D x-sort must scan everything on a y filter")
    assert(yOnlyZ <= 16, s"z-layout touched $yOnlyZ/64 partitions on a y-only box")

    // 2-D box 16×16 of 256×256: z-locality keeps it in a few blocks
    val boxZ = touched(zStats, Some((100L, 115L)), Some((40L, 55L)))
    assert(boxZ <= 8, s"z-layout touched $boxZ/64 partitions for a 1/256-area box")
  }
}
