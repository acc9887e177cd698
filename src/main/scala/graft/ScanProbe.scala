package graft
import org.apache.spark.sql.functions._

/** Micro-bisect for the 1.6 s single-task documents scan (r12): times scan
  * variants to attribute the cost — raw count, legacy-conf read, length
  * aggregate, the shingle-filter predicate, and the fanOut shape.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[$name run$i] ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
      }
    }
    val path = s"$dir/documents.parquet"
    time("raw count")(spark.read.parquet(path).count())
    time("raw sum(length)")(
      spark.read.parquet(path).agg(sum(length(col("text")))).collect()(0))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    time("legacyconf sum(length)")(
      spark.read.parquet(path).agg(sum(length(col("text")))).collect()(0))
    time("split filter count")(
      spark.read.parquet(path)
        .where(size(split(col("text"), " ")) >= 3).count())
    time("repart+split filter count")(
      spark.read.parquet(path).repartition(32)
        .where(size(split(col("text"), " ")) >= 3).count())
    time("tables.t + repart + filter")(
      Tables.t(spark, dir, "documents").repartition(32)
        .where(size(split(col("text"), " ")) >= 3).count())
    // the d13-shaped variant: filter pushed below the exchange?
    val d = Tables.t(spark, dir, "documents").repartition(32)
    time("d13 shape: union + shingle filter")(
      d.select(col("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 20000).as("doc_id"),
            array_join(slice(split(col("text"), " "), 1, 30), " ").as("text")))
        .where(size(split(col("text"), " ")) >= 3).count())
    spark.stop()
  }
}

/** Second probe: the REAL pairOverlaps pieces, timed stage by stage. */
object ScanProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[$name run$i] ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
      }
    }
    val d0 = Tables.t(spark, dir, "documents").repartition(32)
      .select("doc_id", "text")
    time("shingleSets count")(
      llm.Dedup.shingleSets(d0, 3).count())
    time("shingle explode count")(
      llm.Dedup.shingleSets(d0, 3)
        .select(col("doc_id"), explode(col("shingle_set")).as("shingle"))
        .count())
    time("postings agg count")(
      llm.Dedup.shingleSets(d0, 3)
        .select(col("doc_id"), size(col("shingle_set")).cast("long").as("_n"),
          explode(col("shingle_set")).as("shingle"))
        .groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id").as("_id"), col("_n"))))
          .as("_ids"))
        .filter(size(col("_ids")) > 1).count())
    time("full jaccardPairs count")(
      llm.Dedup.jaccardPairs(d0, 3, 0.6).count())
    spark.stop()
  }
}
