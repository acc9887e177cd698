package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** The S1 ingest boundary (SURVEY.md §2.1): the reference fetches HTML
  * pages one at a time and row-parses them inline (crawl.py:34-47 fetch +
  * cache; crawl.py:90-113 calendar-day extraction; crawl.py:153-167
  * roll-call rows; crawl.py:192-206 vote divs). The Spark-native shape is:
  *
  *   1. fetch raw pages into a landing zone (one file per page — the
  *      reference's `.cached_html/` IS this landing zone);
  *   2. `spark.read.text(wholetext=true)` over the zone — each page one
  *      row, parallelized by file;
  *   3. a scalar parse UDF returning an array of typed structs + `explode`
  *      (the §2.10 generator pattern) — extraction runs distributed, one
  *      task per batch of pages, no driver loop.
  *
  * The parser here handles the calendar-page shape (month headers with
  * linked day numbers, ` ` suffixes stripped like crawl.py:106-107)
  * with regexes, standing in for an HTML library without changing the
  * dataflow shape.
  */
object LandingZone {

  /** One page per row, with the source file path for lineage. */
  def readPages(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .withColumn("page_path", input_file_name())

  private val months = Seq("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")
  private val monthNum: Map[String, Int] =
    months.zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  private val monthBlock =
    ("""(?s)<div class="CalendarDisplay-List-Month">\s*(\w+)\s*</div>(.*?)""" +
      """(?=<div class="CalendarDisplay-List-Month">|$)""").r
  private val dayLink = """<a[^>]*>([^<]+)</a>""".r

  /** page text → array of (month, day) calendar entries. */
  val parseCalendarDays: UserDefinedFunction = udf { (page: String) =>
    if (page == null) Array.empty[(Int, Int)]
    else monthBlock.findAllMatchIn(page).flatMap { m =>
      val month = monthNum.getOrElse(m.group(1), 0)
      dayLink.findAllMatchIn(m.group(2)).flatMap { l =>
        // " " suffixes carry footnote markers — strip like the
        // reference does (crawl.py:106-107)
        val s = l.group(1).split(' ').head.trim
        s.toIntOption.map(d => (month, d))
      }
    }.toArray.filter(_._1 > 0)
  }

  /** Landing zone → one row per calendar day: the end-to-end S1 dataflow.
    * Year comes from the page path (`.../<year>.html`).
    */
  def calendarDays(spark: SparkSession, dir: String): DataFrame =
    readPages(spark, dir)
      .withColumn("year",
        regexp_extract(col("page_path"), """(\d{4})\.html""", 1).cast("int"))
      .select(col("year"),
        explode(parseCalendarDays(col("value"))).as("md"))
      .select(col("year"), col("md._1").as("month"), col("md._2").as("day"))
      .withColumn("date", make_date(col("year"), col("month"), col("day")))
}
