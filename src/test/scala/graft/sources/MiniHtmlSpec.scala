package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class MiniHtmlSpec extends AnyFunSuite {

  test("findAll matches tags with depth-counted nesting, recursively") {
    val html = """<div class="a"><div class="b">x</div></div><div id="c">y</div>"""
    val all = MiniHtml.findAll(html, "div")
    assert(all.flatMap(_.classes.headOption) == Vector("a", "b"))
    assert(all.size == 3)
    assert(MiniHtml.find(html, "div", MiniHtml.byId("c")).map(_.inner) == Some("y"))
    assert(MiniHtml.find(html, "div", MiniHtml.byClass("b")).map(_.inner) == Some("x"))
  }

  test("tag-prefix boundaries: <tr> never matches <track>, <td> not <tdata>") {
    val html = "<table><tr><td>1</td><td>2</td></tr><track/></table>"
    assert(MiniHtml.findAll(html, "tr").size == 1)
    assert(MiniHtml.findAll(html, "td").map(_.inner) == Vector("1", "2"))
  }

  test("false-prefix open hit before a real nested open does not truncate") {
    // <br matches the "<b" needle: the scanner must skip it AND still see
    // the genuine nested <b> that follows, closing at the SECOND </b>
    val html = "<b>x<br>y<b>z</b>w</b>tail"
    val e = MiniHtml.find(html, "b").get
    assert(e.inner == "x<br>y<b>z</b>w")
    assert(MiniHtml.findAll(html, "b").map(_.inner) == Vector("x<br>y<b>z</b>w", "z"))
  }

  test("self-closing same-tag child does not break depth counting") {
    val html = """<div class="outer"><div/><span>x</span></div>"""
    val e = MiniHtml.find(html, "div", MiniHtml.byClass("outer")).get
    assert(e.inner == "<div/><span>x</span>")
  }

  test("children interleaves elements with non-blank text nodes") {
    val kids = MiniHtml.children("""<input type="c"/><span>Y</span> ADAMS """)
    assert(kids.length == 3)
    assert(kids(0).asInstanceOf[MiniHtml.Elem].tag == "input")
    assert(kids(1).asInstanceOf[MiniHtml.Elem].text == "Y")
    assert(kids(2).asInstanceOf[MiniHtml.Text].s.trim == "ADAMS")
  }

  test("attrs parse quoted, unquoted and bare forms") {
    val e = MiniHtml.find("""<option value="2023" selected class='x y'>t</option>""",
      "option").get
    assert(e.attrs("value") == "2023")
    assert(e.attrs.contains("selected"))
    assert(e.classes == Seq("x", "y"))
  }

  test("void and self-closed tags have no inner content") {
    val kids = MiniHtml.children("<br><b>q</b><img src=x/>tail")
    assert(kids.collect { case e: MiniHtml.Elem => e.tag } ==
      Vector("br", "b", "img"))
  }

  test("queryParams decodes url-encoded parameters") {
    val q = MiniHtml.queryParams(
      "/cfdocs/rc_view_action2.cfm?sess_yr=2023&sess_ind=0&rc_body=H&rc_nbr=101&x=a%20b")
    assert(q == Map("sess_yr" -> "2023", "sess_ind" -> "0", "rc_body" -> "H",
      "rc_nbr" -> "101", "x" -> "a b"))
  }

  test("textOf strips nested markup like BeautifulSoup .text") {
    assert(MiniHtml.textOf("<a><b>Hello</b> <i>World</i></a>") == "Hello World")
  }
}
