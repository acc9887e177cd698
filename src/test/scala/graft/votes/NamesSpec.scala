package graft.votes

import org.scalatest.funsuite.AnyFunSuite

/** Name-kernel unit tests; cases mined from the reference's special cases
  * (crawl.py:264-268, names.py:36, names.py special handling) and the
  * vote_data corpus name forms.
  */
class NamesSpec extends AnyFunSuite {

  // ---- F3 advanced_decapitalization (crawl.py:227-243)
  test("advancedDecapitalization handles Mc names") {
    assert(Names.advancedDecapitalization("BRIAN McRAE") == "Brian McRae")
  }
  test("advancedDecapitalization all-caps → title") {
    assert(Names.advancedDecapitalization("JOHN SMITH") == "John Smith")
  }
  test("advancedDecapitalization mixed stays sane") {
    assert(Names.advancedDecapitalization("O'BRIEN") == "O'Brien")
  }
  test("pythonTitle matches str.title semantics") {
    assert(Names.pythonTitle("McRAE") == "Mcrae")
    assert(Names.pythonTitle("o'brien") == "O'Brien")
    assert(Names.pythonTitle("smith-jones") == "Smith-Jones")
  }

  // ---- F4 name parsing
  test("parse First Last") {
    assert(Name.parse("Brad Roae") == Name(first = "Brad", last = "Roae"))
  }
  test("parse First M. Last") {
    assert(Name.parse("Patrick J. Harkins") ==
      Name(first = "Patrick", middle = "J.", last = "Harkins"))
  }
  test("parse trailing suffix with and without dot") {
    assert(Name.parse("Stewart J. Greenleaf Sr") ==
      Name("Stewart", "J.", "Greenleaf", "Sr"))
    assert(Name.parse("John Smith Jr.") == Name("John", "", "Smith", "Jr."))
    assert(Name.parse("Robert Matzie III") == Name("Robert", "", "Matzie", "III"))
  }
  test("parse multi-token middle (HumanName split)") {
    assert(Name.parse("Carrie A. Lewis DelRosso") ==
      Name("Carrie", "A. Lewis", "DelRosso"))
  }
  test("parse comma form") {
    assert(Name.parse("Smith, John") == Name(first = "John", last = "Smith"))
  }
  test("parse single token is a first name (HumanName behavior)") {
    assert(Name.parse("Smith") == Name(first = "Smith"))
  }
  test("display round-trips") {
    val n = Name("Patrick", "J.", "Harkins", "Jr.")
    assert(Name.parse(n.display) == n)
  }

  // ---- F6 nicknames (names.py:35-49)
  test("special pairs match") {
    assert(Nicknames.isNicknameOf("Tommy", "Thomas"))
    assert(Nicknames.isNicknameOf("Stan", "Stanley"))
  }
  test("plain nickname matches one way") {
    assert(Nicknames.isNicknameOf("Mike", "Michael"))
    assert(!Nicknames.isNicknameOf("Michael", "Mike"))
  }
  test("LONG_NAMES tiebreak") {
    // Chris↔Christopher / Christine-style bidirectional hits resolve toward
    // the LONG_NAMES canonical
    assert(Nicknames.isNicknameOf("Chris", "Christopher"))
  }

  // ---- F7 resolve_initial (names.py:52-67)
  test("resolveInitial") {
    assert(Names.resolveInitial("J.", "John").contains("John"))
    assert(Names.resolveInitial("J", "John").contains("John"))
    assert(Names.resolveInitial("John", "J.").contains("John"))
    assert(Names.resolveInitial("J.", "Kevin").isEmpty)
    assert(Names.resolveInitial("Jo", "John").isEmpty)
    assert(Names.resolveInitial("", "John").isEmpty)
  }

  // ---- F8 match_middle (names.py:70-84)
  test("matchMiddle") {
    assert(Names.matchMiddle("A.", "").contains("A."))
    assert(Names.matchMiddle("", "Allen").contains("Allen"))
    assert(Names.matchMiddle("A.", "Allen").contains("Allen"))
    assert(Names.matchMiddle("A.", "Brian").isEmpty)
    assert(Names.matchMiddle("Al", "Allen").isEmpty) // same initial, unresolvable
  }

  // ---- F10 is_same_name (names.py:96-149)
  private def n(f: String = "", m: String = "", l: String = "", s: String = "") =
    Name(f, m, l, s)

  test("exact match") {
    assert(Names.isSameName(n("John", "", "Smith"), n("John", "", "Smith"))
      .contains(n("John", "", "Smith")))
  }
  test("different lasts never match") {
    assert(Names.isSameName(n("John", "", "Smith"), n("John", "", "Jones")).isEmpty)
  }
  test("title-case last reconciliation prefers the non-title original") {
    assert(Names.isSameName(n("John", "", "Mcrae"), n("John", "", "McRae"))
      .exists(_.last == "McRae"))
  }
  test("bare-last probe matches anything with that last") {
    assert(Names.isSameName(n(l = "Smith"), n("John", "A.", "Smith", "Jr."))
      .contains(n("John", "A.", "Smith", "Jr.")))
  }
  test("nickname first match takes canonical") {
    assert(Names.isSameName(n("Mike", "", "Smith"), n("Michael", "", "Smith"))
      .exists(_.first == "Michael"))
  }
  test("initial first match") {
    assert(Names.isSameName(n("J.", "", "Smith"), n("John", "", "Smith"))
      .exists(_.first == "John"))
  }
  test("F. Scott pattern") {
    // "T. Scott Smith" vs "S. Smith": first-initial+middle, where the other
    // side's first is an initial of the middle (names.py:87-93)
    assert(Names.isSameName(n("T.", "Scott", "Smith"), n("S.", "", "Smith"))
      .exists(nm => nm.first == "T." && nm.middle == "Scott"))
    // identical middles don't trigger it (resolve_initial("Scott","Scott")=None)
    assert(Names.isSameName(n("T.", "Scott", "Smith"), n("Scott", "", "Smith")).isEmpty)
  }
  test("middle merge: initial expands") {
    assert(Names.isSameName(n("John", "A.", "Smith"), n("John", "Allen", "Smith"))
      .exists(_.middle == "Allen"))
  }
  test("middle conflict blocks the match") {
    assert(Names.isSameName(n("John", "Allen", "Smith"), n("John", "Brian", "Smith")).isEmpty)
  }
  test("suffix strict vs lenient") {
    assert(Names.isSameName(n("John", "", "Smith", "Jr."), n("John", "", "Smith")).isEmpty)
    assert(Names.isSameName(n("John", "", "Smith", "Jr."), n("John", "", "Smith"),
      requireSuffix = false).exists(_.suffix == "Jr."))
    assert(Names.isSameName(n("John", "", "Smith", "Jr."), n("John", "", "Smith", "Sr."),
      requireSuffix = false).isEmpty)
  }

  // ---- F5 assert_names_equal (crawl.py:271-299)
  test("assertNamesEqual: same first, hyphen-extended last") {
    assert(Names.assertNamesEqual(n("Jane", "", "Smith-Jones"), n("Jane", "", "Jones")))
  }
  test("assertNamesEqual: equal lasts always pass (crawl.py:283 quirk)") {
    assert(Names.assertNamesEqual(n("Zzz", "", "Smith"), n("Qqq", "", "Smith")))
  }
  test("assertNamesEqual: different names fail") {
    assert(!Names.assertNamesEqual(n("Jane", "", "Smith"), n("John", "", "Jones")))
  }
}
