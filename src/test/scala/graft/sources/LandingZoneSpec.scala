package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S1 ingest boundary: landing-zone pages → parse UDF → exploded typed
  * rows, on calendar-page-shaped fixtures (the reference's day-extraction
  * dataflow, crawl.py:90-113).
  */
class LandingZoneSpec extends SparkSpec {

  private def page(entries: (String, Seq[String])*): String =
    entries.map { case (month, days) =>
      s"""<div class="Column-OneHalf"><h3>Session</h3>
         |<div class="CalendarDisplay-List-Row">
         |<div class="CalendarDisplay-List-Month"> $month </div>
         |${days.map(d => s"""<a href="/day">$d</a>""").mkString("\n")}
         |</div></div>""".stripMargin
    }.mkString("\n")

  test("landing zone pages explode into one row per linked day") {
    val dir = Files.createTempDirectory("lz_")
    Files.write(dir.resolve("2023.html"),
      page("January" -> Seq("3", "17 *", "30"),
        "February" -> Seq("6")).getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("2024.html"),
      page("March" -> Seq("11", "nope", "12")).getBytes(StandardCharsets.UTF_8))

    val days = LandingZone.calendarDays(spark, dir.toString)
      .orderBy("year", "month", "day")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDate(3).toString))

    assert(days === Array(
      (2023, 1, 3, "2023-01-03"),
      (2023, 1, 17, "2023-01-17"),   //   footnote marker stripped
      (2023, 1, 30, "2023-01-30"),
      (2023, 2, 6, "2023-02-06"),
      (2024, 3, 11, "2024-03-11"),   // non-numeric link skipped
      (2024, 3, 12, "2024-03-12")))
  }

  test("pages parallelize by file and keep lineage") {
    val dir = Files.createTempDirectory("lz2_")
    for (y <- 2020 to 2025)
      Files.write(dir.resolve(s"$y.html"),
        page("May" -> Seq("1")).getBytes(StandardCharsets.UTF_8))
    val pages = LandingZone.readPages(spark, dir.toString)
    assert(pages.count() === 6)
    assert(pages.select("page_path").distinct().count() === 6)
    assert(LandingZone.calendarDays(spark, dir.toString)
      .select("year").distinct().count() === 6)
  }
}
