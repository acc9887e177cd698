package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[$name run$i] rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
