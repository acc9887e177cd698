package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitter summary as a typed Aggregator.
  *
  * The buffer holds at most `m` (item, counter) pairs. Stream update is the
  * classic MG step: increment a present item; insert when there is room;
  * otherwise decrement EVERY counter by one and drop the zeros (each such
  * step retires m+1 units of total count, so it happens at most n/(m+1)
  * times — amortized O(1) per row). Merge is the mergeable-summaries form
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi 2012): add counters
  * pointwise, then if more than `m` survive, subtract the (m+1)-th largest
  * counter value from every counter and keep the strictly positive ones.
  * Both forms preserve the MG guarantee for ANY merge tree — true count
  * minus summary count ≤ n/(m+1) — so every item with true frequency
  * > n/(m+1) is guaranteed present in the final candidate set, no matter
  * how Spark partitions or combines.
  *
  * That makes this the scale path for "which values dominate the corpus":
  * each map task forwards ≤ m counters per group instead of shuffling every
  * row of a 100 TB table to count it. The candidates then get EXACT counts
  * via a semi-join confirm pass (only candidate rows shuffle), so the final
  * answer is deterministic and oracle-checkable — the sketch only decides
  * what is worth counting, never the published number. `a19_heavy_hitters`
  * hash-checks the composed operator against a plain exact-count oracle;
  * `HeavyHittersAggSpec` property-tests the superset guarantee and the
  * confirm-pass equivalence under random merge shapes.
  */
class HeavyHittersAgg(m: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(m > 0, s"capacity must be positive: $m")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], w: String): mutable.Map[String, Long] = {
    // null items are skipped, not counted: a null key would survive to
    // finish(), where the String sort NPEs
    if (w == null) return buf
    buf.get(w) match {
      case Some(c) => buf(w) = c + 1
      case None if buf.size < m => buf(w) = 1L
      case None =>
        // decrement-all: the arriving item and one unit of every counter
        // annihilate (m+1 count units retired)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (k, c) =>
          if (c == 1L) dead += k else buf(k) = c - 1
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(b1: mutable.Map[String, Long],
                     b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    if (b1.size > m) {
      // subtract the (m+1)-th largest counter from everything; ≤ m
      // counters can be strictly larger than it, so the bound holds
      val cut = b1.values.toArray.sortWith(_ > _).apply(m)
      val kept = b1.collect { case (k, c) if c > cut => k -> (c - cut) }
      b1.clear()
      kept.foreach { case (k, c) => b1(k) = c }
    }
    b1
  }

  // sorted so the single output row is deterministic byte-for-byte even
  // though downstream only treats it as a membership set
  override def finish(buf: mutable.Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
