package graft.sources

import graft.votes.{Chamber, Names}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** S1 member-side page parsers: the current member list
  * (crawl.py:378-506), the archive view-all lists (crawl.py:302-330), and
  * the per-member bio/service pages (crawl.py:533-636) — in the same
  * landing-zone → parse-UDF → explode dataflow as [[LandingZone]].
  *
  * Archive-redirect resolution (crawl.py:345-366) is modeled by
  * [[Resolutions]] as a broadcast dimension: the reference resolves HTTP
  * redirects live and memoizes them in resolutions.yaml; at query time the
  * cache IS the mapping, so a broadcast left join replaces the per-URL
  * HEAD loop (no network in the engine).
  */
object MemberPages {

  private val partyCodes = Map("D" -> "Democrat", "R" -> "Republican",
    "I" -> "Independent")
  private val partyRe = """\((.)\)""".r
  private val districtRe = """District (\d+)""".r

  /** parse_year_range (crawl.py:333-342): "2019-2021" → 2019..2021,
    * "2023" → [2023]. Blows up on non-numeric text exactly like the
    * reference (int() raises).
    */
  def parseYearRange(s: String): Seq[Int] =
    if (!s.contains('-')) Seq(s.trim.toInt)
    else {
      val (a, b) = s.splitAt(s.indexOf('-'))
      (a.trim.toInt to b.drop(1).trim.toInt).toSeq
    }

  /** Chamber from the page FILE NAME (house_*.html / senate_*.html) — the
    * basename only, never the full path: an ancestor directory containing
    * "house" (e.g. a warehouse dir) must not reclassify every page.
    */
  private def chamberFromPath(pathCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val base = element_at(split(pathCol, "/"), -1)
    when(base.startsWith("house"), Chamber.HOUSE)
      .when(base.startsWith("senate"), Chamber.SENATE)
  }

  // ---- current member list (crawl.py:378-506) ---------------------------

  /** Selected SessYear option text (`\xa0` → space like crawl.py:401) →
    * the service year range for every member on the page.
    */
  val parseSessYears: UserDefinedFunction = udf { (page: String) =>
    if (page == null) Array.empty[Int]
    else (for {
      dropdown <- MiniHtml.find(page, "select", MiniHtml.byId("SessYear"))
      selected <- MiniHtml.findAll(dropdown.inner, "option")
        .find(_.attrs.contains("selected"))
    } yield parseYearRange(
      selected.text.replace('\u00a0', ' ').trim).toArray)
      .getOrElse(Array.empty[Int])
  }

  /** One entry per `.MemberInfoList-MemberWrapper`: display name, parsed
    * name fields, current id (link `id` query param), the bio href (the
    * [[Resolutions]] join key), party and district from the bio div's TEXT
    * nodes (crawl.py:473-494). A missing party/district or an unparseable
    * info text is fatal in the reference (RuntimeError); here the entry is
    * emitted with nulls so one bad member doesn't kill the distributed
    * parse — callers gate on completeness downstream.
    */
  val parseMemberList: UserDefinedFunction = udf { (page: String) =>
    if (page == null)
      Array.empty[(String, String, String, String, String, Int, String, Option[String], Option[Int])]
    else MiniHtml.findAll(page, "div", MiniHtml.byClass("MemberInfoList-MemberWrapper"))
      .flatMap { wrapper =>
        for {
          bio <- MiniHtml.find(wrapper.inner, "div",
            MiniHtml.byClass("MemberInfoList-MemberBio"))
          a <- MiniHtml.find(bio.inner, "a")
          href = a.attrs.getOrElse("href", "")
          currentId <- MiniHtml.queryParams(href).get("id").flatMap(_.toIntOption)
        } yield {
          val display = a.text.trim
          val nm = Names.parseName(display)
          var party: Option[String] = None
          var district: Option[Int] = None
          MiniHtml.children(bio.inner).foreach {
            case MiniHtml.Text(t) if t.trim.nonEmpty =>
              val text = t.trim
              partyRe.findPrefixMatchOf(text) match {
                case Some(m) => party = partyCodes.get(m.group(1))
                case None => districtRe.findPrefixMatchOf(text)
                  .foreach(m => district = Some(m.group(1).toInt))
              }
            case _ => ()
          }
          (display, nm.first, nm.middle, nm.last, nm.suffix,
            currentId, href, party, district)
        }
      }.toArray
  }

  /** Landing zone of member-list pages → one row per member per service
    * year: (chamber from the page path `.../house_*.html` | `senate_*`,
    * year, name fields, current_id, href, party, district). Empty name
    * fields become NULL like get_name_dict (crawl.py:257-261).
    */
  def memberList(spark: SparkSession, dir: String): DataFrame = {
    def n(c: String) = when(col(c) === "", lit(null)).otherwise(col(c))
    LandingZone.readPages(spark, dir)
      .withColumn("chamber", chamberFromPath(col("page_path")))
      .withColumn("_years", parseSessYears(col("value")))
      .select(col("chamber"), col("_years"),
        explode(parseMemberList(col("value"))).as("m"))
      .select(col("chamber"), col("_years"),
        col("m._1").as("display_name"), col("m._2").as("first"),
        col("m._3").as("middle"), col("m._4").as("last"),
        col("m._5").as("suffix"), col("m._6").as("current_id"),
        col("m._7").as("href"), col("m._8").as("party"),
        col("m._9").as("district"))
      .withColumn("first", n("first")).withColumn("middle", n("middle"))
      .withColumn("last", n("last")).withColumn("suffix", n("suffix"))
      .select(col("chamber"), explode(col("_years")).as("year"),
        col("display_name"), col("first"), col("middle"), col("last"),
        col("suffix"), col("current_id"), col("href"), col("party"),
        col("district"))
  }

  // ---- archive view-all member lists (crawl.py:302-330) -----------------

  /** Every link inside the wrapper div (id `portfolioPaginationWrapper`
    * for House letters pages, class `Column-Full` for the Senate list) →
    * (archive_id from the `ID` query param, full name).
    */
  val parseArchiveList: UserDefinedFunction = udf { (page: String, wrapperId: String, wrapperClass: String) =>
    if (page == null) Array.empty[(Int, String, String, String, String, String)]
    else {
      val pred: MiniHtml.Elem => Boolean =
        if (wrapperId != null && wrapperId.nonEmpty) MiniHtml.byId(wrapperId)
        else MiniHtml.byClass(wrapperClass)
      MiniHtml.find(page, "div", pred).toArray.flatMap { content =>
        MiniHtml.findAll(content.inner, "a").flatMap { a =>
          MiniHtml.queryParams(a.attrs.getOrElse("href", "")).get("ID")
            .flatMap(_.toIntOption)
            .map { id =>
              val display = a.text.trim
              val nm = Names.parseName(display)
              (id, display, nm.first, nm.middle, nm.last, nm.suffix)
            }
        }
      }
    }
  }

  /** Landing zone of archive list pages → (chamber, archive_id, name
    * fields). House pages use the pagination wrapper id; Senate the
    * Column-Full class — chamber again from the page path.
    */
  def archiveList(spark: SparkSession, dir: String): DataFrame = {
    def n(c: String) = when(col(c) === "", lit(null)).otherwise(col(c))
    LandingZone.readPages(spark, dir)
      .withColumn("chamber", chamberFromPath(col("page_path")))
      .withColumn("_w_id",
        when(col("chamber") === Chamber.HOUSE, "portfolioPaginationWrapper")
          .otherwise(lit(null: String)))
      .withColumn("_w_cls",
        when(col("chamber") === Chamber.SENATE, "Column-Full")
          .otherwise(lit(null: String)))
      .select(col("chamber"),
        explode(parseArchiveList(col("value"), col("_w_id"), col("_w_cls"))).as("m"))
      .select(col("chamber"), col("m._1").as("archive_id"),
        col("m._2").as("display_name"), n("m._3").as("first"),
        n("m._4").as("middle"), n("m._5").as("last"), n("m._6").as("suffix"))
  }

  // ---- bio/service pages (crawl.py:533-636) -----------------------------

  /** Bio page → (name, dob, service rows). House pages keep the service
    * table under `.bio-table` with the life range in `<h4>`; Senate pages
    * use `table.DataTable-Grid` and `<h3>` (crawl.py:559-567). Service
    * rows need exactly 5 cells (Sessions/Office/Position/District/Party),
    * th rows are headers, "Chief Clerk" rows are skipped, district "N/A"
    * or unparseable → null, empty party → null (crawl.py:588-612). Pages
    * with a `.Message-Error` div yield nothing (crawl.py:553-556).
    */
  val parseBio: UserDefinedFunction = udf { (page: String, chamber: Int) =>
    if (page == null ||
      MiniHtml.find(page, "div", MiniHtml.byClass("Message-Error")).isDefined) None
    else {
      val table =
        if (chamber == Chamber.HOUSE)
          MiniHtml.find(page, "div", MiniHtml.byClass("bio-table"))
            .flatMap(d => MiniHtml.find(d.inner, "table"))
        else MiniHtml.find(page, "table", MiniHtml.byClass("DataTable-Grid"))
      val lifeTag = if (chamber == Chamber.HOUSE) "h4" else "h3"
      val lifeS = MiniHtml.find(page, lifeTag).map(_.text.trim).getOrElse("")
      val nameS = MiniHtml.find(page, "h1").map(_.text.trim).getOrElse("")
      // dob only when the life range has a dash AND the birth part carries
      // a slashed date (crawl.py:577-581)
      val dob: String =
        if (!lifeS.contains('-')) null
        else {
          val dobS = lifeS.split('-').head.trim
          if (!dobS.contains('/')) null
          else LandingZone.parseUsStamp(s"$dobS 12:00 AM")
            .map(t => t.toLocalDateTime.toLocalDate.toString).orNull
        }
      val rows = table.toSeq.flatMap { t =>
        MiniHtml.findAll(t.inner, "tr")
          .filter(tr => MiniHtml.findAll(tr.inner, "th").isEmpty)
          .flatMap { tr =>
            val cells = MiniHtml.findAll(tr.inner, "td").map(_.text.trim)
            if (cells.length != 5) None
            else {
              val office = cells(1)
              if (office == "Chief Clerk") None
              else if (office.nonEmpty &&
                !(office == "Representative" && chamber == Chamber.HOUSE)) None
              else {
                val district: Option[Int] =
                  if (cells(3) == "N/A" || cells(3).isEmpty) None
                  else cells(3).toIntOption
                val party = if (cells(4).isEmpty) None else Some(cells(4))
                scala.util.Try(parseYearRange(cells(0))).toOption
                  .map(years => (years.toArray, district, party))
              }
            }
          }
      }
      val nm = Names.parseName(nameS)
      Some((nameS, nm.first, nm.middle, nm.last, nm.suffix, dob,
        rows.toArray))
    }
  }

  /** Landing zone of bio pages (`.../<chamber>_<archive_id>.html`) → one
    * service row per (member, year): the bio-driven `service` ingest, plus
    * dob/name on every row for the members upsert.
    */
  def bioService(spark: SparkSession, dir: String): DataFrame =
    LandingZone.readPages(spark, dir)
      .withColumn("chamber", chamberFromPath(col("page_path")))
      .withColumn("archive_id", LandingZone.idFromPath(col("page_path")))
      .withColumn("_bio", parseBio(col("value"), col("chamber")))
      .filter(col("_bio").isNotNull)
      .select(col("chamber"), col("archive_id"),
        col("_bio._1").as("display_name"), col("_bio._2").as("first"),
        col("_bio._3").as("middle"), col("_bio._4").as("last"),
        col("_bio._5").as("suffix"),
        col("_bio._6").cast("date").as("dob"),
        explode(col("_bio._7")).as("svc"))
      .select(col("chamber"), col("archive_id"), col("display_name"),
        col("first"), col("middle"), col("last"), col("suffix"), col("dob"),
        explode(col("svc._1")).as("year"),
        col("svc._2").as("district"), col("svc._3").as("party"))
}

/** The redirect-resolution cache (crawl.py:345-366) as a broadcast
  * dimension. The reference memoizes `url → resolved-or-null` in
  * resolutions.yaml and consults it before issuing HEAD requests; a fresh
  * clone CRASHES at import because the file is absent (crawl.py:345 opens
  * it unconditionally). Conscious fix: an absent file is an empty cache.
  * Unresolved URLs (cache miss) stay null — the engine never fetches.
  */
object Resolutions {

  /** url → resolved URL (None for "resolves to itself", stored as null in
    * the YAML exactly like the reference writes it).
    */
  def load(path: String): Map[String, Option[String]] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else {
      val yaml = new org.yaml.snakeyaml.Yaml()
      val in = new java.io.FileInputStream(f)
      try {
        yaml.load[java.util.Map[String, String]](in) match {
          case null => Map.empty
          case m =>
            import scala.jdk.CollectionConverters._
            m.asScala.map { case (k, v) => k -> Option(v) }.toMap
        }
      } finally in.close()
    }
  }

  /** The cache as a two-column DataFrame (url, resolved). */
  def toDf(spark: SparkSession, cache: Map[String, Option[String]]): DataFrame = {
    import spark.implicits._
    cache.toSeq.map { case (k, v) => (k, v.orNull) }.toDF("url", "resolved")
  }

  /** Attach `archive_id` to member rows via the cache: broadcast left join
    * on the absolute bio URL, then an archive id only when the resolved
    * URL is an archives URL carrying an `ID` param (crawl.py:419-438).
    * The reference's "bonus search" re-resolution (crawl.py:421-424)
    * requires live HTTP and is out of engine scope — such URLs stay
    * unresolved (null archive_id), exactly like a cache miss.
    */
  def withArchiveIds(members: DataFrame, resolutions: DataFrame,
                     baseUrl: String, hrefCol: String = "href"): DataFrame = {
    val joined = members
      .withColumn("_abs_url", concat(lit(baseUrl), col(hrefCol)))
      .join(broadcast(resolutions), col("_abs_url") === col("url"), "left")
    val idStr = regexp_extract(col("resolved"), """[?&]ID=(\d+)""", 1)
    joined
      // the ID-param presence check matters: regexp_extract yields "" on a
      // miss, and casting "" throws under ANSI instead of producing null
      .withColumn("archive_id",
        when(col("resolved").contains("archives") && idStr =!= "",
          idStr.cast("int")))
      .drop("_abs_url", "url", "resolved")
  }
}
