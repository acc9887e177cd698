package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 re-expressed over the
  * driver's synthetic tables; each entry with an `oracleSql` is hash-checked
  * against DuckDB at sf0.01. Entries without an oracle (UDF-heavy ER /
  * hash-sketch ops) get a rows-only check.
  */
object SparkEntry {

  private val all: Map[String, Q] =
    Relational.entries ++ Scalar.entries ++ PipelineOps.entries ++ Extras.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per region: fact scan → broadcast dim joins → exact-cents agg.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.t(spark, dir, "lineitem")
    val o = Tables.t(spark, dir, "orders")
    val c = Tables.t(spark, dir, "customer")
    val n = broadcast(Tables.t(spark, dir, "nation"))
    val r = broadcast(Tables.t(spark, dir, "region"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** Hand-written Spark-SQL twins for the oracles whose DuckDB dialect
    * has no mechanical translation (see [[graft.sql.DuckDialect]]); the
    * dialect-parity gate prefers these when present and requires them to
    * match the DataFrame entry row-exactly.
    */
  def oracleSqlAnsi: Map[String, String] =
    all.collect { case (k, q) if q.ansi.isDefined => k -> q.ansi.get }
}
