package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.immutable.SortedSet

/** Typed Aggregator for gaps-and-islands condense (the UDAF formulation of
  * `graft.ops.Islands` / reference crawl.py:509-530): accumulates a sorted
  * distinct int set per group and renders "2007-2010, 2012".
  *
  * The SQL islands formulation is preferred at scale (no per-group set in
  * memory on the reduce side — see Islands.condense); this Aggregator is
  * the right tool when the per-group cardinality is known-small (years of
  * service: tens) and a single aggregation pass beats window + two
  * groupBys. Both produce identical strings — `a11b_condense_udaf` checks
  * this against the same DuckDB oracle as `a11_islands_condense`.
  */
object CondenseAgg extends Aggregator[Long, SortedSet[Long], String] {

  override def zero: SortedSet[Long] = SortedSet.empty[Long]

  override def reduce(b: SortedSet[Long], a: Long): SortedSet[Long] = b + a

  override def merge(b1: SortedSet[Long], b2: SortedSet[Long]): SortedSet[Long] =
    b1 ++ b2

  override def finish(s: SortedSet[Long]): String = {
    if (s.isEmpty) return ""
    val sb = new StringBuilder
    var runLo = s.head
    var prev = s.head
    def emit(lo: Long, hi: Long): Unit = {
      if (sb.nonEmpty) sb ++= ", "
      sb ++= (if (lo == hi) lo.toString else s"$lo-$hi")
    }
    for (v <- s.tail) {
      if (v != prev + 1) { emit(runLo, prev); runLo = v }
      prev = v
    }
    emit(runLo, prev)
    sb.toString
  }

  override def bufferEncoder: Encoder[SortedSet[Long]] =
    Encoders.kryo[SortedSet[Long]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
