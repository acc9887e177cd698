package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args)
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").explain("formatted")
    spark.stop()
  }
}
