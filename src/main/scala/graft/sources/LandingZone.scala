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
      .withColumn("year", {
        val ex = regexp_extract(col("page_path"), """(\d{4})\.html""", 1)
        when(ex =!= "", ex.cast("int"))
      })
      .select(col("year"),
        explode(parseCalendarDays(col("value"))).as("md"))
      .select(col("year"), col("md._1").as("month"), col("md._2").as("day"))
      .withColumn("date", make_date(col("year"), col("month"), col("day")))

  // ---- roll-call DataTable rows (crawl.py:151-167) ----------------------

  /** page text → array of roll-call rows. The reference walks
    * `table.DataTable > tbody > tr`, takes each row's FIRST link (asserting
    * its id starts with RCLink), and reads the roll identity from the
    * link's query params. Rows whose first link is not an RCLink are
    * skipped here rather than crashing the job (the reference asserts;
    * conscious fix — one malformed row must not kill a distributed parse).
    */
  val parseRollRows: UserDefinedFunction = udf { (page: String) =>
    if (page == null) Array.empty[(Int, Int, Int, Int, String)]
    else (for {
      table <- MiniHtml.find(page, "table", MiniHtml.byClass("DataTable")).toSeq
      tbody <- MiniHtml.find(table.inner, "tbody").toSeq
      tr <- MiniHtml.findAll(tbody.inner, "tr")
      a <- MiniHtml.findAll(tr.inner, "a").headOption
        .filter(_.attrs.getOrElse("id", "").startsWith("RCLink")).toSeq
      q = MiniHtml.queryParams(a.attrs.getOrElse("href", ""))
      nbr <- q.get("rc_nbr").flatMap(_.toIntOption)
      yr <- q.get("sess_yr").flatMap(_.toIntOption)
      ind <- q.get("sess_ind").flatMap(_.toIntOption)
      ch <- q.get("rc_body").flatMap(graft.votes.Chamber.fromLetterOption)
    } yield (nbr, yr, ind, ch, a.text.trim)).toArray
  }

  /** ANSI-safe numeric id from a page path: null (not a cast error) when
    * the file name carries no digits before ".html".
    */
  private[sources] def idFromPath(pathCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ex = regexp_extract(pathCol, """(\d+)\.html""", 1)
    when(ex =!= "", ex.cast("long"))
  }

  /** Landing zone of per-day floor-vote pages (`.../<day_id>.html`) → one
    * row per roll call, same schema as the `roll_calls` ingest.
    */
  def rollCalls(spark: SparkSession, dir: String): DataFrame =
    readPages(spark, dir)
      .withColumn("day_id",
        idFromPath(col("page_path")))
      .select(col("day_id"), explode(parseRollRows(col("value"))).as("r"))
      .select(col("day_id"), col("r._1").as("number"),
        col("r._2").as("session_year"), col("r._3").as("session_index"),
        col("r._4").as("chamber"), col("r._5").as("name"))

  // ---- roll-page vote divs + time stamp (crawl.py:188-218) --------------

  /** page text → array of (name, vote) pairs. The reference iterates every
    * descendant div of `.RollCalls-ListContainer`, skips formatting divs
    * (class starting "Column"), and for the rest reads child 1 (an
    * element) as the vote letter and child 2 (a text node) as the name.
    */
  val parseVoteDivs: UserDefinedFunction = udf { (page: String) =>
    if (page == null) Array.empty[(String, Int)]
    else MiniHtml.find(page, "div", MiniHtml.byClass("RollCalls-ListContainer"))
      .toArray.flatMap { container =>
        MiniHtml.findAll(container.inner, "div")
          .filterNot(_.classes.headOption.exists(_.startsWith("Column")))
          .flatMap { d =>
            val kids = MiniHtml.children(d.inner)
            (kids.lift(1), kids.lift(2)) match {
              case (Some(e: MiniHtml.Elem), Some(MiniHtml.Text(name))) =>
                graft.votes.VoteCode.fromLetterOption(e.text.trim)
                  .map(v => (name.trim, v))
              case _ => None
            }
          }
      }
  }

  /** page text → roll-call time stamp, or null when the side column does
    * not carry the three info sections (crawl.py:208-218). The reference
    * feeds `"{date} {time}"` to a permissive parser; the pages carry
    * `MM/DD/YYYY` + `hh:mm a` (with a possible weekday prefix on the date).
    */
  val parseRollStamp: UserDefinedFunction = udf { (page: String) =>
    if (page == null) null
    else (for {
      side <- MiniHtml.find(page, "div", MiniHtml.byClass("Column-OneFourth"))
      sections = MiniHtml.children(side.inner).collect {
        case e: MiniHtml.Elem if e.tag == "div" => e
      }
      info <- sections.lift(1)
      infoSections = MiniHtml.children(info.inner).collect {
        case e: MiniHtml.Elem if e.tag == "div" => e
      }
      if infoSections.length == 3
      stamp <- parseUsStamp(
        s"${infoSections(0).text.trim} ${infoSections(1).text.trim}")
    } yield stamp).orNull
  }

  private[sources] def parseUsStamp(s: String): Option[java.sql.Timestamp] = {
    // strip a leading weekday name if present ("Monday, 06/05/2023")
    val cleaned = s.replaceAll("^[A-Za-z]+,\\s*", "").trim
    val fmts = Seq("M/d/yyyy h:mm a", "M/d/yyyy H:mm", "M/d/yyyy h:mm:ss a")
    fmts.iterator.flatMap { f =>
      try {
        val fmt = java.time.format.DateTimeFormatter.ofPattern(f,
          java.util.Locale.US)
        Some(java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.parse(cleaned, fmt)))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }.nextOption()
  }

  /** Landing zone of per-roll pages (`.../<roll_id>.html`) → one row per
    * individual vote plus the roll's stamp: the `votes` ingest.
    */
  def rollVotes(spark: SparkSession, dir: String): DataFrame =
    readPages(spark, dir)
      .withColumn("roll_id",
        idFromPath(col("page_path")))
      .withColumn("stamp", parseRollStamp(col("value")))
      .select(col("roll_id"), col("stamp"),
        explode(parseVoteDivs(col("value"))).as("v"))
      .select(col("roll_id"), col("v._1").as("name"), col("v._2").as("vote"),
        col("stamp"))
}
