package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (optionally)
  * an equivalent DuckDB SQL oracle over the same parquet tables, plus
  * (optionally) a hand-written Spark-SQL twin of that oracle for the few
  * dialect shapes [[graft.sql.DuckDialect]] cannot translate mechanically
  * (ASOF JOIN, IN-subquery in a SELECT list, named-window refinement,
  * list slicing). Queries with no SQL-expressible oracle (UDF-heavy ER,
  * hash-based sketches) get a rows-only check from the driver.
  * DialectParitySpec requires every runnable form — raw, translated, or
  * `ansi` twin — to match the DataFrame entry row-exactly.
  */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String],
             ansi: Option[String] = None)

object Q {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle), None)
  def apply(oracle: String, ansi: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle), Some(ansi))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None, None)
}
