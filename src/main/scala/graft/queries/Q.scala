package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (optionally)
  * an equivalent DuckDB SQL oracle over the same parquet tables. Queries
  * with no SQL-expressible oracle (UDF-heavy ER, hash-based sketches) get a
  * rows-only check from the driver.
  */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}
