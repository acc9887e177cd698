package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession: local master sized by
  * `cores`, shuffle partitions matched to it (not the 200 default — at
  * local scale an oversized shuffle fan-out just burns task overhead),
  * UTC, UI off, and the Graft extensions (native expressions) installed.
  */
object Sessions {
  def local(cores: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-" +
          ProcessHandle.current().pid())
      .withExtensions(new GraftExtensions)
      .getOrCreate()
}
