package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.SparkSpec
import graft.votes._
import org.apache.spark.sql.functions._

/** End-to-end S1 integration: render every page shape the reference
  * crawls (floor-vote day pages, roll pages, member list, bio pages),
  * run the full parser → relational-model → export pipeline, and compare
  * the emitted CSV bytes against [[Export.exportLong]] fed the same model
  * directly. Parsers and pipeline must agree byte-for-byte — the "a user
  * of the reference could switch" proof for the crawl side.
  */
class CrawlPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def write(dir: Path, name: String, body: String): Unit =
    Files.write(dir.resolve(name), body.getBytes(StandardCharsets.UTF_8))

  // ---- the synthetic legislature --------------------------------------

  private val year = 2023
  // (day_id, date, rolls: (number, name, stamp, votes: name -> letter))
  private val days = Seq(
    (10L, "2023-01-03", Seq(
      (1, "HB 1 FINAL", Some("01/03/2023 10:30 AM"),
        Map("ALPHA" -> "Y", "BETA" -> "N", "GAMMA" -> "E")),
      (2, "HB 2", Some("01/03/2023 09:05 AM"),
        Map("ALPHA" -> "Y", "BETA" -> "Y", "GAMMA" -> "X")))),
    (11L, "2023-01-04", Seq(
      (3, "HB 3", None,
        Map("ALPHA" -> "X", "BETA" -> "E", "GAMMA" -> "Y")))))
  // (display name on pages, current_id, party letter, district,
  //  canonical first/last for the model)
  private val members = Seq(
    ("ANN ALPHA", 101, "D", 2, "Ann", "Alpha"),
    ("BOB BETA", 102, "R", 1, "Bob", "Beta"),
    ("CID GAMMA", 103, "D", 7, "Cid", "Gamma"))

  // ---- page renderers (the shapes crawl.py consumes) -------------------

  private def dayPage(rolls: Seq[(Int, String, Option[String], Map[String, String])]): String = {
    val rows = rolls.map { case (nbr, name, _, _) =>
      s"""<tr><td><a id="RCLink$nbr" href="rc_view?sess_yr=$year&sess_ind=0&rc_body=H&rc_nbr=$nbr">$name</a></td></tr>"""
    }.mkString("\n")
    s"""<table class="DataTable"><tbody>$rows</tbody></table>"""
  }

  private def rollPage(stamp: Option[String], votes: Map[String, String]): String = {
    val voteDivs = votes.map { case (name, letter) =>
      s"""<div class="RollCalls-Vote"><input type="h"/><span>$letter</span> $name</div>"""
    }.mkString("\n")
    val info = stamp match {
      case Some(s) =>
        val Array(d, t1, t2) = s.split(" ", 3)
        s"<div>$d</div><div>$t1 $t2</div><div>PASSAGE</div>"
      case None => "<div>no</div><div>stamp</div>"
    }
    s"""<div class="RollCalls-ListContainer">
       |  <div class="Column-OneFourth-List">$voteDivs</div>
       |</div>
       |<div class="Column-OneFourth">
       |  <div class="Header">x</div>
       |  <div class="Info">$info</div>
       |</div>""".stripMargin
  }

  private def memberListPage(): String = {
    val divs = members.map { case (name, id, party, district, _, _) =>
      s"""<div class="MemberInfoList-MemberWrapper">
         |  <div class="MemberInfoList-MemberBio">
         |    <a href="mbrBio.cfm?id=$id&body=H">$name</a>
         |    ($party)
         |    <br/>
         |    District $district
         |  </div>
         |</div>""".stripMargin
    }.mkString("\n")
    s"""<select id="SessYear"><option value="$year" selected>$year</option></select>
       |$divs""".stripMargin
  }

  test("pages → parsers → relational model → export matches the direct model byte-for-byte") {
    // render the landing zones
    val dayDir = Files.createTempDirectory("cp_days_")
    val rollDir = Files.createTempDirectory("cp_rolls_")
    val listDir = Files.createTempDirectory("cp_list_")
    for ((dayId, _, rolls) <- days) {
      write(dayDir, s"$dayId.html", dayPage(rolls))
      for ((nbr, _, stamp, votes) <- rolls)
        // roll page path keys the (synthetic) roll id = its number
        write(rollDir, s"$nbr.html", rollPage(stamp, votes))
    }
    write(listDir, s"house_$year.html", memberListPage())

    // ---- crawl side: parse every page shape back into the model
    val parsedRolls = LandingZone.rollCalls(spark, dayDir.toString)
      .withColumn("id", col("number").cast("long")) // roll id = number (see above)
    val parsedVotes = LandingZone.rollVotes(spark, rollDir.toString)
    val parsedMembers = MemberPages.memberList(spark, listDir.toString)
      .withColumn("id", col("current_id").cast("long"))

    val sessions = Seq((1L, Chamber.HOUSE, year, 0, "2023 House",
      Timestamp.valueOf("2023-12-31 00:00:00")))
      .toDF("id", "chamber", "year", "session_index", "name", "last_crawl")
    val sessionDays = days.map { case (id, date, _) =>
      (id, 1L, java.sql.Date.valueOf(date), Timestamp.valueOf("2023-12-01 00:00:00"))
    }.toDF("id", "session_id", "date", "last_crawl")

    val rollCalls = parsedRolls
      .join(parsedVotes.select(col("roll_id"), col("stamp")).distinct(),
        col("id") === col("roll_id"), "left")
      .select(col("id"), col("day_id"), col("session_year"),
        col("session_index"), col("chamber"), col("number"), col("name"),
        col("stamp"))
    val memberRows = parsedMembers
      .select(col("id"), col("first"), col("middle"), col("last"), col("suffix"))
      .distinct()
    val service = parsedMembers
      .select(col("id").as("member_id"), col("year"), col("chamber"),
        col("district"), col("party"))
    // votes resolve names against the roster like MatchNames write-back
    // (fixture vote names are bare upper-case last names)
    val votes = parsedVotes.as("v")
      .join(memberRows.select(col("id").as("member_id"),
        upper(col("last")).as("_last_u")).as("m"),
        col("v.name") === col("_last_u"), "left")
      .select(lit(1L).as("session_id"), col("roll_id"), col("v.name"),
        col("vote"), col("member_id"))

    val longFromPages = Export.exportLong(
      sessions, sessionDays, rollCalls, votes, memberRows, service)

    // ---- direct side: the same model built without the parsers
    val directRolls = days.flatMap { case (dayId, _, rolls) =>
      rolls.map { case (nbr, name, stamp, _) =>
        (nbr.toLong, dayId, year, 0, Chamber.HOUSE, nbr, name,
          stamp.map(s => LandingZone.parseUsStamp(s).get))
      }
    }.toDF("id", "day_id", "session_year", "session_index", "chamber",
      "number", "name", "stamp")
    val directMembers = members.map { case (_, id, _, _, first, last) =>
      (id.toLong, first, null: String, last, null: String)
    }.toDF("id", "first", "middle", "last", "suffix")
    val directService = members.map { case (_, id, party, district, _, _) =>
      (id.toLong, year, Chamber.HOUSE, district,
        if (party == "D") "Democrat" else "Republican")
    }.toDF("member_id", "year", "chamber", "district", "party")
    val directVotes = days.flatMap { case (_, _, rolls) =>
      rolls.flatMap { case (nbr, _, _, vm) =>
        vm.map { case (name, letter) =>
          val mid = members.find(_._6.toUpperCase == name).get._2.toLong
          (1L, nbr.toLong, name, VoteCode.fromLetter(letter), mid)
        }
      }
    }.toDF("session_id", "roll_id", "name", "vote", "member_id")

    val longDirect = Export.exportLong(
      sessions, sessionDays, directRolls, directVotes, directMembers, directService)

    val fromPages = VoteMatrix.toCsvBytes(longFromPages)
    val direct = VoteMatrix.toCsvBytes(longDirect)
    assert(fromPages.nonEmpty)
    assert(java.util.Arrays.equals(fromPages, direct),
      s"parser-derived export diverges from direct model " +
        s"(${fromPages.length} vs ${direct.length} bytes)")
    // sanity on content: 3 rolls × 3 members + headers
    val lines = new String(fromPages, StandardCharsets.UTF_8).split("\r\n")
    assert(lines.length == 3 + 3)
    assert(lines(0).contains("Bob Beta")) // district 1 leads the roster
  }
}
