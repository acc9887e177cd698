package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import graft.votes.Chamber

/** Member-side S1 parsers on reference-shaped fixtures: current member
  * list (crawl.py:378-506), archive view-all lists (crawl.py:302-330),
  * bio/service pages (crawl.py:533-636), and the resolutions cache as a
  * broadcast dimension (crawl.py:345-366).
  */
class MemberPagesSpec extends SparkSpec {

  private def write(dir: java.nio.file.Path, name: String, body: String): Unit =
    Files.write(dir.resolve(name), body.getBytes(StandardCharsets.UTF_8))

  // ---- current member list ---------------------------------------------

  private def memberListPage(yearOpt: String, members: (String, Int, String, Int)*): String = {
    val options =
      s"""<select id="SessYear">
         |<option value="2021">2021 2022</option>
         |<option value="2023" selected>$yearOpt</option>
         |</select>""".stripMargin
    val divs = members.map { case (name, id, party, district) =>
      s"""<div class="MemberInfoList-MemberWrapper">
         |  <div class="MemberInfoList-PhotoWrapper"><img src="x.jpg"/></div>
         |  <div class="MemberInfoList-MemberBio">
         |    <a href="mbrBio.cfm?id=$id&body=H">$name</a>
         |    ($party)
         |    <br/>
         |    District $district
         |  </div>
         |</div>""".stripMargin
    }.mkString("\n")
    s"<html><body>$options\n$divs</body></html>"
  }

  test("member list page: members × selected year range, party and district decoded") {
    val dir = Files.createTempDirectory("mp_list_")
    write(dir, "house_2023.html", memberListPage("2023 - 2024",
      ("JOE EXAMPLE", 101, "D", 7),
      ("MARY SAMPLE", 102, "R", 12)))

    val out = MemberPages.memberList(spark, dir.toString)
      .orderBy("current_id", "year").collect()
    assert(out.length == 4) // 2 members × years 2023,2024
    val joe = out.filter(_.getAs[Int]("current_id") == 101)
    assert(joe.map(_.getAs[Int]("year")).toSeq == Seq(2023, 2024))
    assert(joe.head.getAs[String]("first") == "Joe")
    assert(joe.head.getAs[String]("last") == "Example")
    assert(joe.head.getAs[String]("party") == "Democrat")
    assert(joe.head.getAs[Int]("district") == 7)
    assert(joe.head.getAs[String]("href") == "mbrBio.cfm?id=101&body=H")
    val mary = out.filter(_.getAs[Int]("current_id") == 102)
    assert(mary.head.getAs[String]("party") == "Republican")
    assert(mary.head.getAs[Int]("district") == 12)
  }

  test("single-year dropdown and unknown party stay well-defined") {
    val dir = Files.createTempDirectory("mp_list2_")
    write(dir, "senate_2021.html", memberListPage("2021",
      ("BOB QUORUM", 55, "X", 3)))
    val out = MemberPages.memberList(spark, dir.toString).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("year") == 2021)
    assert(out.head.getAs[Int]("chamber") == Chamber.SENATE)
    assert(out.head.isNullAt(out.head.fieldIndex("party"))) // unknown code → null
    assert(out.head.getAs[Int]("district") == 3)
  }

  // ---- resolutions cache ------------------------------------------------

  test("resolutions cache: absent file is empty (reference crashes on fresh clone)") {
    assert(Resolutions.load("/tmp/definitely_missing_resolutions.yaml").isEmpty)
  }

  test("resolutions yaml: hit, self-resolving null, and miss paths") {
    val dir = Files.createTempDirectory("mp_res_")
    val base = "https://example.test/members/"
    write(dir, "resolutions.yaml",
      s"""${base}mbrBio.cfm?id=101&body=H: https://archives.example.test/people/search?ID=9001
         |${base}mbrBio.cfm?id=102&body=H: null
         |""".stripMargin)
    val cache = Resolutions.load(dir.resolve("resolutions.yaml").toString)
    assert(cache.size == 2)
    assert(cache(s"${base}mbrBio.cfm?id=101&body=H").contains(
      "https://archives.example.test/people/search?ID=9001"))
    assert(cache(s"${base}mbrBio.cfm?id=102&body=H").isEmpty)

    val pages = Files.createTempDirectory("mp_res_pages_")
    write(pages, "house_2023.html", memberListPage("2023",
      ("JOE EXAMPLE", 101, "D", 7),    // cache hit → archive 9001
      ("MARY SAMPLE", 102, "R", 12),   // resolves to itself → no archive id
      ("PAT NOWHERE", 103, "I", 2)))   // cache miss → no archive id
    val members = MemberPages.memberList(spark, pages.toString)
    val out = Resolutions.withArchiveIds(members,
        Resolutions.toDf(spark, cache), base)
      .select("current_id", "archive_id").distinct().collect()
      .map(r => r.getAs[Int]("current_id") ->
        Option(r.getAs[Integer]("archive_id"))).toMap
    assert(out == Map(101 -> Some(9001), 102 -> None, 103 -> None))
  }

  // ---- archive view-all lists ------------------------------------------

  test("archive lists parse links inside the chamber-specific wrapper") {
    val dir = Files.createTempDirectory("mp_arch_")
    write(dir, "house_A.html",
      """<div id="portfolioPaginationWrapper">
        |<a href="view?ID=800">ADAMS, JOHN</a>
        |<a href="view?ID=801">ALBERT JONES</a>
        |</div>
        |<div class="other"><a href="view?ID=999">IGNORED</a></div>""".stripMargin)
    write(dir, "senate_all.html",
      """<div class="Column-Full">
        |<a href="bio.cfm?ID=900">SUSAN SENATE</a>
        |</div>""".stripMargin)
    val out = MemberPages.archiveList(spark, dir.toString)
      .orderBy("archive_id").collect()
    assert(out.map(_.getAs[Int]("archive_id")).toSeq == Seq(800, 801, 900))
    assert(out.head.getAs[String]("last") == "Adams") // comma form parsed
    assert(out.head.getAs[String]("first") == "John")
    assert(out(2).getAs[Int]("chamber") == Chamber.SENATE)
  }

  // ---- bio/service pages ------------------------------------------------

  private def houseBio(name: String, life: String, rows: String): String =
    s"""<html><body><h1>$name</h1><h4>$life</h4>
       |<div class="bio-table"><table>
       |<tr><th>Sessions</th><th>Office</th><th>Position</th><th>District</th><th>Party</th></tr>
       |$rows
       |</table></div></body></html>""".stripMargin

  private def tr(cells: String*): String =
    "<tr>" + cells.map(c => s"<td>$c</td>").mkString + "</tr>"

  test("house bio: dob from slashed life range, year ranges exploded, nulls per rules") {
    val dir = Files.createTempDirectory("mp_bio_")
    write(dir, "house_800.html", houseBio("JOHN ADAMS", "01/15/1950 - 01/01/2020",
      tr("2019-2021", "Representative", "", "7", "Democrat") + "\n" +
        tr("2023", "", "", "N/A", "") + "\n" +
        tr("2022", "Chief Clerk", "", "9", "Republican") + "\n" +   // skipped
        tr("2024", "", "", "xx", "Democrat") + "\n" +               // district unparseable → null
        tr("half", "row")))                                         // ≠ 5 cells → skipped
    val out = MemberPages.bioService(spark, dir.toString)
      .orderBy("year").collect()
    assert(out.map(_.getAs[Int]("year")).toSeq == Seq(2019, 2020, 2021, 2023, 2024))
    assert(out.head.getAs[java.sql.Date]("dob").toString == "1950-01-15")
    assert(out.head.getAs[String]("first") == "John")
    assert(out.head.getAs[Int]("district") == 7)
    val y2023 = out.find(_.getAs[Int]("year") == 2023).get
    assert(y2023.isNullAt(y2023.fieldIndex("district")))
    assert(y2023.isNullAt(y2023.fieldIndex("party")))
    val y2024 = out.find(_.getAs[Int]("year") == 2024).get
    assert(y2024.isNullAt(y2024.fieldIndex("district")))
    assert(y2024.getAs[String]("party") == "Democrat")
  }

  test("senate bio shape and textual life range (no dob)") {
    val dir = Files.createTempDirectory("mp_bio2_")
    write(dir, "senate_900.html",
      """<html><body><h1>SUSAN SENATE</h1><h3>Born in Example County</h3>
        |<table class="DataTable-Grid">
        |<tr><th>Sessions</th><th>Office</th><th>Position</th><th>District</th><th>Party</th></tr>
        |<tr><td>2021-2022</td><td></td><td></td><td>3</td><td>Republican</td></tr>
        |</table></body></html>""".stripMargin)
    val out = MemberPages.bioService(spark, dir.toString).orderBy("year").collect()
    assert(out.map(_.getAs[Int]("year")).toSeq == Seq(2021, 2022))
    assert(out.head.isNullAt(out.head.fieldIndex("dob")))
    assert(out.head.getAs[String]("last") == "Senate")
  }

  test("bio error pages yield no rows") {
    val dir = Files.createTempDirectory("mp_bio3_")
    write(dir, "house_801.html",
      """<html><body><div class="Message-Error">Member not found</div>
        |<h1>GHOST</h1></body></html>""".stripMargin)
    assert(MemberPages.bioService(spark, dir.toString).count() == 0)
  }

  test("parseYearRange mirrors the reference") {
    assert(MemberPages.parseYearRange("2023") == Seq(2023))
    assert(MemberPages.parseYearRange("2019-2021") == Seq(2019, 2020, 2021))
    intercept[NumberFormatException](MemberPages.parseYearRange("20x3"))
  }
}
