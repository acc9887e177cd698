package graft.operators

import org.apache.spark.sql.DataFrame
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
}
