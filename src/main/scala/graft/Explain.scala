package graft
import org.apache.spark.sql.SparkSession

/** Plan-capture harness: prints `explain("formatted")` for each named
  * query, and — when GRAFT_PLANS_DIR is set — also writes each plan to
  * `$GRAFT_PLANS_DIR/<name>_<suffix>.txt` (suffix from GRAFT_PLANS_SUFFIX,
  * default "plan") so before/after plan evidence can be committed
  * per-entry without scraping stdout.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val outDir = sys.env.get("GRAFT_PLANS_DIR")
    val suffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "plan")
    // GRAFT_PLANS_EXEC=1: run the query (bench action) first so the captured
    // plan is the AQE FINAL plan (isFinalPlan=true, runtime join strategy /
    // coalesced reads visible) — the static plan over lineage-cut RDD scans
    // shows SortMergeJoin placeholders that AQE replaces at runtime.
    val exec = sys.env.get("GRAFT_PLANS_EXEC").contains("1")
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (exec) df.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      outDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${name}_$suffix.txt"), plan)
      }
    }
    spark.stop()
  }
}
