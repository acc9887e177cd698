package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runtime bloom-filter join pushdown (j22) — Spark's `InjectRuntimeFilter`
  * builds a bloom filter from the SELECTIVE (creation) side of an
  * equi-join and pushes a `might_contain(xxhash64(key))` predicate into
  * the big (application) side's scan, so fact rows that cannot join are
  * dropped BEFORE the shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~join-selectivity
  * fraction of it.
  *
  * The catch — and why j22 exists as a plan-ASSERTED entry: the rule
  * silently declines under many conditions (feature flag off, creation
  * side bigger than `creationSideThreshold`, application side smaller
  * than `applicationSideScanSizeThreshold` — 10 GB by default, so a toy
  * corpus NEVER qualifies out of the box — broadcast join planned
  * instead of a shuffle join, creation-side filter not judged
  * selective). A pipeline that believes it has bloom pushdown and
  * doesn't just pays the full shuffle with no error anywhere.
  * [[requireInjected]] turns that silence into a failure.
  */
object BloomJoin {

  /** Cloned session tuned so the injection can fire at test-corpus
    * scale: the application-side scan threshold drops from 10 GB to
    * `appSideThresholdBytes` (the MECHANISM under test is Spark's own
    * rule — only the size gate scales down, same discipline as
    * [[SkewJoin.aqeSession]]). On a real cluster leave the defaults:
    * a fact scan under 10 GB doesn't benefit enough to pay the bloom
    * build.
    */
  def bloomSession(parent: SparkSession,
                   appSideThresholdBytes: Long = 1024): SparkSession = {
    val ss = parent.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "32")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      appSideThresholdBytes.toString)
    // the creation-side gate can also silently veto on mid-size corpora
    // (logical sizeInBytes estimates run fat); generous locally, default
    // in production where the bloom build cost is real
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "256MB")
    // the subtlest veto (found the hard way — requireInjected fired in
    // Verify): isProbablyShuffleJoin declines when EITHER side merely
    // COULD broadcast by size, regardless of a merge hint. A toy dim is
    // always broadcastable, so injection never fires unless the size
    // check is off. At production scale a >10 MB dim clears this on its
    // own; a genuinely broadcastable dim doesn't want a bloom anyway.
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss
  }

  /** The join shape the rule targets: big fact, selectively-filtered
    * dim, equi-key, shuffle join (the `merge` hint keeps the dim out of
    * a broadcast — a broadcast join already prunes at the hash lookup,
    * so the rule sees no benefit and declines). The caller's `dim` must
    * carry its selective filter; the rule reads selectivity off the
    * predicate, not statistics.
    */
  def bloomFiltered(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.hint("merge").join(dim, Seq(key))

  /** Fail LOUDLY when the runtime filter did not inject: the optimized
    * plan must carry a `BloomFilterMightContain` (rendered
    * `might_contain(...)`) on the application side. Checked on the
    * OPTIMIZED logical plan — no job runs for the assertion.
    */
  def requireInjected(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.optimizedPlan.toString
    require(plan.contains("might_contain"),
      s"runtime bloom filter was NOT injected — the join will shuffle the " +
        s"full application side. Optimized plan:\n${plan.take(2000)}")
    df
  }
}
