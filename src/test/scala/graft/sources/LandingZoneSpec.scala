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

  test("roll-call DataTable rows parse identity from the RCLink query params") {
    // shape per crawl.py:151-167: tbody rows, first link id=RCLink*,
    // roll identity in the href query string
    val dir = Files.createTempDirectory("lz_rolls_")
    val page =
      """<table class="DataTable"><thead><tr><th>h</th></tr></thead><tbody>
        |<tr><td><a id="RCLink1" href="rc_view?sess_yr=2023&sess_ind=0&rc_body=H&rc_nbr=7"> HB 1 FINAL </a></td>
        |    <td><a href="other">x</a></td></tr>
        |<tr><td><a id="RCLink2" href="rc_view?sess_yr=2023&sess_ind=0&rc_body=H&rc_nbr=8">HB 2</a></td></tr>
        |<tr><td><a id="NotRC" href="rc_view?sess_yr=2023&sess_ind=0&rc_body=H&rc_nbr=9">skip</a></td></tr>
        |</tbody></table>
        |<table class="Other"><tbody><tr><td>
        |  <a id="RCLink9" href="rc_view?sess_yr=1999&sess_ind=0&rc_body=S&rc_nbr=1">wrong table</a>
        |</td></tr></tbody></table>""".stripMargin
    Files.write(dir.resolve("42.html"), page.getBytes(StandardCharsets.UTF_8))

    val rolls = LandingZone.rollCalls(spark, dir.toString)
      .orderBy("number").collect()
    assert(rolls.length == 2)
    assert(rolls.map(r => (r.getAs[Long]("day_id"), r.getAs[Int]("number"),
      r.getAs[Int]("session_year"), r.getAs[Int]("session_index"),
      r.getAs[Int]("chamber"), r.getAs[String]("name"))).toSeq == Seq(
      (42L, 7, 2023, 0, graft.votes.Chamber.HOUSE, "HB 1 FINAL"),
      (42L, 8, 2023, 0, graft.votes.Chamber.HOUSE, "HB 2")))
  }

  test("roll-page vote divs and time stamp parse; formatting divs skipped") {
    // shape per crawl.py:190-218: vote divs carry [icon, letter-element,
    // name-text]; Column* divs are layout; the side column's second
    // section holds date/time/extra divs
    val dir = Files.createTempDirectory("lz_votes_")
    val page =
      """<div class="RollCalls-ListContainer">
        |  <div class="Column-OneFourth-List">
        |    <div class="RollCalls-Vote"><input type="hidden"/><span>Y</span> ADAMS</div>
        |    <div class="RollCalls-Vote"><input type="hidden"/><span>N</span> BAKER</div>
        |  </div>
        |  <div class="Column-OneFourth-List">
        |    <div class="RollCalls-Vote"><input type="hidden"/><span>E</span> COSTA</div>
        |    <div class="RollCalls-Vote"><input type="hidden"/><span>X</span> DAVIS</div>
        |    <div class="RollCalls-Vote"><input type="hidden"/><span>?</span> GHOST</div>
        |  </div>
        |</div>
        |<div class="Column-OneFourth">
        |  <div class="RollCalls-Header">HB 1</div>
        |  <div class="RollCalls-Info">
        |    <div>Monday, 06/05/2023</div>
        |    <div>11:14 AM</div>
        |    <div>FINAL PASSAGE</div>
        |  </div>
        |</div>""".stripMargin
    Files.write(dir.resolve("100.html"), page.getBytes(StandardCharsets.UTF_8))
    // a page whose info section has only 2 divs → null stamp (crawl.py:216-218)
    Files.write(dir.resolve("101.html"), page
      .replace("<div>FINAL PASSAGE</div>", "")
      .replace("ADAMS", "ZEBRA")
      .getBytes(StandardCharsets.UTF_8))

    val votes = LandingZone.rollVotes(spark, dir.toString)
    val r100 = votes.filter(org.apache.spark.sql.functions.col("roll_id") === 100L)
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Int]("vote")).toMap
    assert(r100 == Map("ADAMS" -> graft.votes.VoteCode.YEA,
      "BAKER" -> graft.votes.VoteCode.NAY, "COSTA" -> graft.votes.VoteCode.LEAVE,
      "DAVIS" -> graft.votes.VoteCode.NO_VOTE)) // unknown letter skipped
    val stamps = votes.select("roll_id", "stamp").distinct().collect()
      .map(r => r.getAs[Long]("roll_id") -> Option(r.getAs[java.sql.Timestamp]("stamp")))
      .toMap
    assert(stamps(100L).map(_.toString).contains("2023-06-05 11:14:00.0"))
    assert(stamps(101L).isEmpty)
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
