package graft
import scala.util.control.NonFatal
object ParityDebug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Tables.names.foreach { n => Tables.t(spark, dir, n).createOrReplaceTempView(n) }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.oracleSql.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.oracleSql.get(name).foreach { sql =>
        val t = graft.sql.DuckDialect.translate(sql)
        def run(q: String): String =
          try { spark.sql(q).collect(); "OK" }
          catch { case NonFatal(e) => e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(300) }
        println(s"### $name")
        val raw = run(sql)
        println(s"  raw: ${raw.linesIterator.mkString(" / ").take(200)}")
        if (t != sql && !sql.toUpperCase.contains("MATERIALIZED")) {
          val tr = run(t)
          println(s"  translated: ${tr.linesIterator.mkString(" / ").take(300)}")
          if (tr != "OK") println("  SQL>> " + t.linesIterator.mkString(" \\n ").take(700))
        }
      }
    }
    spark.stop()
  }
}
