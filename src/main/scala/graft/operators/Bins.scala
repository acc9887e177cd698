package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared interval→bin explosion for the binned time joins
  * ([[RangeJoin]], [[IntervalJoin]]): each [start, end] interval
  * replicates into the `binSeconds` buckets it covers, with loud runtime
  * guards instead of silent corruption:
  *
  *  - an INVERTED interval (end before start) fails — `sequence(lo, hi)`
  *    with lo > hi would otherwise generate a DESCENDING bin array
  *    (|lo−hi|+1 rows — a swapped-by-a-year corrupt row explodes into
  *    millions of bins and bypasses a naive `hi - lo + 1 > max` check,
  *    whose left side goes negative);
  *  - an interval covering more than `maxReplication` bins fails — the
  *    symptom of a binSeconds far smaller than the interval length.
  *
  * Null starts/ends propagate to a null bin array and the row drops out
  * of the explode, matching inner-join null semantics.
  */
private[operators] object Bins {

  def binnedExplode(df: DataFrame, startCol: String, endCol: String,
                    binSeconds: Long, maxReplication: Long,
                    opName: String): DataFrame = {
    val s = unix_timestamp(col(startCol))
    val e = unix_timestamp(col(endCol))
    val lo = floor(s / binSeconds)
    val hi = floor(e / binSeconds)
    df.withColumn("_bin", explode(
      when(e < s,
        raise_error(concat(lit(s"$opName: inverted interval ["),
          col(startCol).cast("string"), lit(", "),
          col(endCol).cast("string"), lit("] (end before start)"))))
        .when(hi - lo + 1 > maxReplication,
          raise_error(concat(lit(s"$opName: interval covers "),
            (hi - lo + 1).cast("string"),
            lit(s" bins > maxReplication=$maxReplication; raise binSeconds"))))
        .otherwise(sequence(lo, hi))))
  }
}
