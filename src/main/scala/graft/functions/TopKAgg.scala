package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, tiebreak-id) candidate for bounded top-k. Ordering is
  * score DESC, id ASC — the id tiebreak makes the result deterministic
  * under any partitioning / merge order.
  */
case class Scored(score: Long, id: Long)

/** Bounded per-group top-k as a typed Aggregator: each buffer holds at most
  * `k` candidates, kept sorted (score DESC, id ASC).
  *
  * This is the scale-path alternative to the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`): a window rank
  * shuffles EVERY row of the group and sorts the full group on the reduce
  * side, while this aggregator is map-side combinable — each map task
  * forwards at most k rows per group, so the shuffle payload is bounded by
  * (groups × k × tasks-touched) instead of the table. At 100 TB with a
  * handful of groups, that is the difference between a full-table sort and
  * a near-free agg. Per-row cost is O(k) array insert (k is small by
  * definition of top-k); merge is a linear two-pointer merge of sorted
  * arrays truncated at k.
  *
  * `w7_grouped_topk` checks it against a DuckDB row_number oracle;
  * TopKAggSpec property-tests it against the window formulation.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k > 0, s"k must be positive: $k")

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[Scored] = Array.empty

  override def reduce(buf: Array[Scored], a: Scored): Array[Scored] = {
    // full buffer and the candidate loses to the current minimum: no-op —
    // the overwhelmingly common case once the buffer warms up
    if (buf.length == k && !beats(a, buf(k - 1))) buf
    else merge(buf, Array(a))
  }

  override def merge(b1: Array[Scored], b2: Array[Scored]): Array[Scored] = {
    val out = new Array[Scored](math.min(b1.length + b2.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b2.length || (i < b1.length && beats(b1(i), b2(j)))) {
        out(o) = b1(i); i += 1
      } else {
        out(o) = b2(j); j += 1
      }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Scored]): Array[Scored] = buf

  override def bufferEncoder: Encoder[Array[Scored]] =
    Encoders.kryo[Array[Scored]]

  override def outputEncoder: Encoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
}
