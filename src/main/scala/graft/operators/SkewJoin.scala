package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys — the generic form of the
  * hand-salting the ER join uses (MatchNames block keys). When a fact
  * table's join key is heavily skewed, a plain shuffle join sends every
  * row of a hot key to one reducer; if the dimension side is too large to
  * broadcast (or the plan must avoid AQE's post-hoc skew splitting, e.g.
  * under a fixed output partitioning), the classic fix is salting: each
  * fact row gets a deterministic salt in [0, S), the dimension is
  * replicated S ways, and the join runs on (key, salt) — hot-key work
  * fans out over S reducers at the cost of an S× dimension replication.
  *
  * The salt is a hash of the whole fact row (xxhash64 over all columns),
  * not a random number: results and partition placement are reproducible
  * across runs and retries (a rand() salt breaks task-retry determinism).
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salt` ways.
    * Output columns = fact ++ (dim minus key), like a plain `join(dim, key)`.
    *
    * @param saltOn fact columns to hash for the salt. Defaults to all fact
    *               columns; pass an explicit high-cardinality subset when
    *               the fact side is wide (hashing a large payload per row
    *               buys no extra spread) or contains map-typed columns
    *               (xxhash64 rejects MapType).
    */
  def salted(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
             saltOn: Seq[String] = Seq.empty): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "_salt is reserved")
    val hashCols = if (saltOn.nonEmpty) saltOn else fact.columns.toSeq
    val missing = hashCols.filterNot(fact.columns.contains)
    require(missing.isEmpty, s"saltOn columns not in fact: ${missing.mkString(",")}")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(hashCols.map(col): _*), lit(salt.toLong)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Session tuned so AQE's `OptimizeSkewedJoin` fires at test-corpus
    * scale (j21): the production defaults call a partition skewed only
    * past 256 MB, which a local-mode toy corpus never reaches, so the
    * thresholds scale down while the MECHANISM under test (runtime skew
    * detection + partition splitting) stays Spark's own. Cloned session
    * (own SQLConf, shared SparkContext) — nothing concurrent on the
    * parent ever observes these overrides. On a real cluster the
    * defaults are usually right; leave them alone and just keep AQE on.
    */
  def aqeSession(parent: SparkSession,
                 skewedPartitionThresholdBytes: Long = 100L * 1024,
                 advisoryPartitionSizeBytes: Long = 50L * 1024,
                 skewedPartitionFactor: Double = 2.0): SparkSession = {
    val ss = parent.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "32")
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      skewedPartitionThresholdBytes.toString)
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      advisoryPartitionSizeBytes.toString)
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      skewedPartitionFactor.toString)
    ss
  }

  /** Native-AQE twin of [[salted]] (j21): the same skewed equi-join,
    * handled by Spark's runtime skew split instead of hand-salting. The
    * `merge` hint pins a sort-merge join — it keeps the tiny dim side
    * out of a broadcast (which would dissolve the skew problem the entry
    * exists to exercise) AND tells AQE not to demote the SMJ, leaving
    * `OptimizeSkewedJoin` free to split oversized partitions and
    * replicate the matching dim rows per split. Results are identical to
    * the plain join by construction (AQE splits preserve join
    * semantics), so j21 shares j12's oracle verbatim.
    *
    * When manual salting ([[salted]]) is still required:
    *   - the SKEWED side must broadcast or the join is not sort-merge /
    *     shuffled-hash (AQE only splits SMJ and SHJ shuffle partitions);
    *   - the join output must keep a FIXED partitioning for a downstream
    *     stage (AQE's split changes the output partitioning, which is
    *     why `OptimizeSkewedJoin` skips joins under a required child
    *     distribution);
    *   - AQE is disabled, or the skew is in the *dimension* replication
    *     factor rather than partition bytes (salting spreads by key
    *     construction, not by observed size).
    */
  def aqeSkewed(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.hint("merge").join(dim, Seq(key))
}
