package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioned/bucketed storage layout helpers — the physical-design side
  * of the 100 TB plan (SURVEY.md §4): facts live partitioned by their
  * pruning keys (the reference's `votes.session_id` denormalization,
  * pa_legislature.yaml:25, exists for exactly this purpose), dimensions
  * live bucketed by join key so repeated joins co-locate without a
  * shuffle.
  */
object PartitionedStore {

  /** Write `df` as parquet partitioned by `partitionCols`. Readers that
    * filter on those columns scan only matching directories (partition
    * pruning — verify with `.explain`'s `PartitionFilters`).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read back a partitioned table. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist `df` as a bucketed managed table: `buckets` files clustered
    * and sorted by `keys`. Two tables bucketed the same way join with
    * ZERO exchanges — the sort-merge join reads co-located buckets
    * directly, which is the cluster answer to "this join shuffles 100 TB
    * every night".
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** True if the physical plan contains no shuffle exchange. */
  def shuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
