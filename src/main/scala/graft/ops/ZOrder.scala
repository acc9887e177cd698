package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout — the data-skipping story
  * for scans that filter on MORE than one column. A 1-D sort clusters its
  * sort key perfectly and leaves every other dimension scattered across
  * all files: a predicate on the secondary column reads the whole table.
  * Interleaving the key bits puts rows that are close in EVERY dimension
  * into the same contiguous z-range, so per-file min/max stats prune on
  * each dimension independently — the layout behind lakehouse
  * OPTIMIZE-ZORDER and the reason a (custkey, date)-filtered scan of a
  * 100 TB fact table can touch a few hundred files instead of all of
  * them. Filter selectivity 1/k in each of d dimensions prunes to
  * ~(1/k)^d of the files, vs 1/k on the sort key (and 1 — nothing — on
  * every other column) for the 1-D sort.
  *
  * Construction is pure integer bit arithmetic (codegen-friendly, no
  * UDF): bit j of dimension i lands at interleaved position j·d + i.
  * Keys must be rank- or range-normalized into [0, 2^bits) first — the
  * caller chooses the normalization (modulo for synthetic uniform keys,
  * width_bucket/ntile for skewed real domains); zvalue masks to `bits`
  * so out-of-range inputs cannot silently corrupt high interleave bits.
  */
object ZOrder {

  /** Morton code of `cols` (each already normalized to [0, 2^bits)):
    * bit j of cols(i) → output bit j·cols.size + i. Total width must fit
    * a signed long.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"interleaved width ${bits * cols.size} must be in [1, 63]")
    val d = cols.size
    val masked = cols.map(c => c.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    (0 until bits).flatMap { j =>
      masked.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * d + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Range-partition + locally sort by the z-value: each output partition
    * (= file, at write time) owns a contiguous z-range, so its min/max
    * stats are tight in every interleaved dimension. One shuffle —
    * identical cost shape to the 1-D sort it replaces.
    */
  def layout(df: DataFrame, cols: Seq[Column], bits: Int,
             numPartitions: Int, zCol: String = "_z"): DataFrame = {
    require(!df.columns.contains(zCol),
      s"column name $zCol is reserved by ZOrder.layout (override zCol)")
    df.withColumn(zCol, zvalue(cols, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
  }
}
