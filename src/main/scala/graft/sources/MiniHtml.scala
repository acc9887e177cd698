package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML element tokenizer for the S1 page parsers.
  *
  * The reference walks pages with an HTML library (crawl.py:153-167 roll
  * rows, crawl.py:192-218 vote divs, crawl.py:378-506 member list,
  * crawl.py:553-636 bio pages) and its semantics depend on node-level
  * structure — `list(div.children)` interleaves TEXT nodes with elements
  * and the parsers index into that sequence — so flat regexes can't carry
  * the port. This is a deliberately small, self-contained tag matcher
  * (find element, match its close tag with depth counting, expose direct
  * children including text nodes); not a general HTML parser, but exact on
  * the page shapes the reference consumes.
  */
object MiniHtml {

  sealed trait Child
  final case class Text(s: String) extends Child
  final case class Elem(tag: String, attrs: Map[String, String], inner: String) extends Child {
    def classes: Seq[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSeq
    def text: String = textOf(inner)
  }

  /** Tags that never have content or a closing tag. */
  private val voidTags = Set("br", "hr", "img", "input", "meta", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")

  private val attrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s>]+))?""".r

  private def parseAttrs(header: String): Map[String, String] =
    attrRe.findAllMatchIn(header).map { m =>
      val v = Option(m.group(3)).orElse(Option(m.group(4)))
        .getOrElse(Option(m.group(2)).getOrElse(""))
      m.group(1).toLowerCase -> v
    }.toMap

  /** Parse the element whose '<' is at `start`; returns the element and the
    * index just past its close tag. Depth-counts same-tag nesting.
    */
  private def parseElemAt(html: String, start: Int): Option[(Elem, Int)] = {
    if (start >= html.length || html.charAt(start) != '<') return None
    val headEnd = html.indexOf('>', start)
    if (headEnd < 0) return None
    val head = html.substring(start + 1, headEnd)
    if (head.startsWith("!") || head.startsWith("/") || head.startsWith("?")) return None
    val tagEnd = head.indexWhere(c => c.isWhitespace || c == '/')
    val tag = (if (tagEnd < 0) head else head.substring(0, tagEnd)).toLowerCase
    if (tag.isEmpty || !tag.head.isLetter) return None
    val attrs = parseAttrs(if (tagEnd < 0) "" else head.substring(tagEnd))
    if (head.endsWith("/") || voidTags(tag))
      return Some((Elem(tag, attrs, ""), headEnd + 1))
    // find the matching close tag, counting nested same-tag opens. A hit
    // must be a real tag boundary, not a prefix (<tr vs <track) — false
    // hits are SKIPPED AND RESCANNED, never allowed to short-circuit the
    // other branch (a `<br` prefix hit before a genuine nested `<b>` must
    // not make the scanner take the close-tag branch early).
    def boundary(at: Int, len: Int): Boolean = {
      val j = at + len
      j < html.length && (html.charAt(j) == '>' || html.charAt(j) == '/' ||
        html.charAt(j).isWhitespace)
    }
    def nextHit(needle: String, from: Int, skipLen: Int): Int = {
      var at = html.indexOf(needle, from)
      while (at >= 0 && !boundary(at, skipLen)) at = html.indexOf(needle, at + 1)
      at
    }
    var depth = 1
    var i = headEnd + 1
    while (depth > 0) {
      val open = nextHit(s"<$tag", i, 1 + tag.length)
      val close = nextHit(s"</$tag", i, 2 + tag.length)
      if (close < 0) return None
      if (open >= 0 && open < close) {
        // a self-closing same-tag child (<div/>) has no close tag and must
        // not increment depth — it would orphan the real close
        val he = html.indexOf('>', open)
        if (he > 0 && html.charAt(he - 1) == '/') i = he + 1
        else { depth += 1; i = open + 1 }
      } else {
        depth -= 1
        i = html.indexOf('>', close) match { case -1 => return None; case e => e + 1 }
      }
    }
    val innerEnd = html.lastIndexOf('<', i - 1)
    Some((Elem(tag, attrs, html.substring(headEnd + 1, innerEnd)), i))
  }

  /** All elements with `tag` satisfying `pred`, in document order,
    * descending into matches too (BeautifulSoup find_all is recursive).
    */
  def findAll(html: String, tag: String,
              pred: Elem => Boolean = _ => true): Vector[Elem] = {
    val out = Vector.newBuilder[Elem]
    def walk(s: String): Unit = {
      var i = s.indexOf('<')
      while (i >= 0) {
        parseElemAt(s, i) match {
          case Some((e, end)) =>
            if (e.tag == tag && pred(e)) out += e
            walk(e.inner)
            i = s.indexOf('<', end)
          case None =>
            i = s.indexOf('<', i + 1)
        }
      }
    }
    walk(html)
    out.result()
  }

  def find(html: String, tag: String,
           pred: Elem => Boolean = _ => true): Option[Elem] =
    findAll(html, tag, pred).headOption

  def byClass(cls: String): Elem => Boolean = _.classes.contains(cls)
  def byId(id: String): Elem => Boolean = _.attrs.get("id").contains(id)

  /** Direct children of an inner-HTML string: elements plus NON-BLANK text
    * nodes (the reference's `list(x.children)` also yields whitespace-only
    * strings, but every indexed access it performs lands on semantic nodes;
    * dropping blank runs keeps fixture indices stable).
    */
  def children(inner: String): Vector[Child] = {
    val out = ArrayBuffer.empty[Child]
    var i = 0
    while (i < inner.length) {
      val lt = inner.indexOf('<', i)
      if (lt < 0) {
        val t = inner.substring(i)
        if (t.trim.nonEmpty) out += Text(t)
        i = inner.length
      } else {
        val t = inner.substring(i, lt)
        if (t.trim.nonEmpty) out += Text(t)
        parseElemAt(inner, lt) match {
          case Some((e, end)) => out += e; i = end
          case None => i = lt + 1
        }
      }
    }
    out.toVector
  }

  /** Concatenated text content with tags stripped (BS `.text`). */
  def textOf(html: String): String =
    html.replaceAll("<[^>]*>", "")

  /** Query params of a URL or href: last value wins for repeated keys
    * (the reference's parse_qs collapses single-valued lists,
    * crawl.py:157-158; all params it reads are single-valued).
    */
  def queryParams(href: String): Map[String, String] = {
    val q = href.indexOf('?') match {
      case -1 => return Map.empty
      case at => href.substring(at + 1)
    }
    q.split('&').filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) => Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap
  }
}
