package graft.votes

/** The fuzzy name-equality kernel (SURVEY.md §2.8 F3–F10), a pure-Scala
  * re-expression of the reference's name logic: crawl.py:223-299 and
  * names.py:52-149. No Spark dependency — wrapped as UDFs in
  * [[NameUdfs]].
  */
object Names {

  private val AllCaps = "^[^a-z]+$".r
  private val TwoCaps = "[A-Z]{2}".r

  /** Python str.title(): first alpha of every alpha-run uppercased, the
    * rest lowercased (boundaries are any non-alpha char).
    */
  def pythonTitle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevAlpha = false
    for (c <- s) {
      if (c.isLetter) {
        sb += (if (prevAlpha) c.toLower else c.toUpper)
        prevAlpha = true
      } else { sb += c; prevAlpha = false }
    }
    sb.toString
  }

  /** `BRIAN McRAE` → `Brian McRae`; all-caps input → title case
    * (reference: crawl.py:227-243). A lowercase char or space re-arms
    * capitalization; an uppercase char after another uppercase is lowered.
    */
  def advancedDecapitalization(s: String): String = {
    if (AllCaps.findFirstIn(s).isDefined) return pythonTitle(s)
    val sb = new StringBuilder(s.length)
    var capitalize = true
    for (c <- s) {
      if (c.isLower || c == ' ') { sb += c; capitalize = true }
      else if (capitalize) { sb += c.toUpper; capitalize = false }
      else sb += c.toLower
    }
    sb.toString
  }

  /** Parse a raw crawled name into parts, normalizing SHOUTING input first
    * (reference: crawl.py:246-261). Empty middle/suffix become empty
    * strings here; the DataFrame layer maps them to NULL.
    */
  def parseName(raw: String): Name = {
    val s = if (TwoCaps.findFirstIn(raw).isDefined) advancedDecapitalization(raw) else raw
    Name.parse(s)
  }

  /** "J." / "J" matches "John" → Some("John") (reference: names.py:52-67). */
  def resolveInitial(name1: String, name2: String): Option[String] = {
    if (name1.isEmpty || name2.isEmpty) return None
    if (name1.charAt(0) != name2.charAt(0)) return None
    val (short, long) =
      if (name1.length < name2.length) (name1, name2) else (name2, name1)
    if (short.length == 2 && short.charAt(1) == '.' && long.length > 2) Some(long)
    else if (short.length == 1 && long.length > 1) Some(long)
    else None
  }

  /** Merge middle names, initial-aware; None on conflict
    * (reference: names.py:70-84).
    */
  def matchMiddle(middle1: String, middle2: String): Option[String] = {
    if (middle1.nonEmpty && middle2.isEmpty) Some(middle1)
    else if (middle2.nonEmpty && middle1.isEmpty) Some(middle2)
    else if (middle1.isEmpty && middle2.isEmpty) Some(middle1)
    else if (middle1 == middle2) Some(middle1)
    else resolveInitial(middle1, middle2) // conflict (incl. same initial) → None
  }

  /** "F. Scott" pattern: first-initial + middle on one side vs plain first
    * on the other (reference: names.py:87-93).
    */
  def resolveFirstMiddle(name1: Name, name2: Name, recurse: Boolean = true): Option[Name] = {
    if (name1.first.length == 2 && name1.first.charAt(1) == '.' &&
        name1.middle.nonEmpty && name2.middle.isEmpty &&
        resolveInitial(name2.first, name1.middle).isDefined)
      Some(name1)
    else if (recurse) resolveFirstMiddle(name2, name1, recurse = false)
    else None
  }

  /** Full fuzzy name equality returning the MERGED canonical name, or None
    * if the names don't refer to the same person
    * (reference: names.py:96-149). The reference prints a warning and
    * falls through to None on unresolvable suffixes; we just return None.
    */
  def isSameName(name1: Name, name2: Name, requireSuffix: Boolean = true): Option[Name] = {
    // --- last: exact, or title-case reconciliation (names.py:98-108)
    val last: String =
      if (name1.last == name2.last) name1.last
      else if (pythonTitle(name1.last) == pythonTitle(name2.last)) {
        if (pythonTitle(name1.last) == name1.last) name2.last
        else if (pythonTitle(name2.last) == name2.last) name1.last
        else return None
      } else return None

    // --- bare last-name probe matches anything with that last (names.py:110-111)
    if (name1.first.isEmpty && name1.middle.isEmpty && name1.suffix.isEmpty)
      return Some(name2)

    // --- first: equality / nickname / initial / F-Scott (names.py:113-129)
    var first = ""
    var middle = ""
    if (name1.first == name2.first) first = name1.first
    else if (Nicknames.isNicknameOf(name1.first, name2.first)) first = name2.first
    else if (Nicknames.isNicknameOf(name2.first, name1.first)) first = name1.first
    else resolveInitial(name1.first, name2.first) match {
      case Some(f0) => first = f0
      case None =>
        resolveFirstMiddle(name1, name2) match {
          case Some(fscott) => first = fscott.first; middle = fscott.middle
          case None => return None
        }
    }

    // --- middle merge (names.py:131-135)
    if (middle.isEmpty && (name1.middle.nonEmpty || name2.middle.nonEmpty)) {
      matchMiddle(name1.middle, name2.middle) match {
        case Some(m) => middle = m
        case None => return None
      }
    }

    // --- suffix rules (names.py:137-149)
    if (name1.suffix == name2.suffix)
      Some(Name(first, middle, last, name1.suffix))
    else if (requireSuffix) None
    else if (name1.suffix.nonEmpty && name2.suffix.isEmpty)
      Some(Name(first, middle, last, name1.suffix))
    else if (name2.suffix.nonEmpty && name1.suffix.isEmpty)
      Some(Name(first, middle, last, name2.suffix))
    else None // both set and different: reference warns + returns None
  }

  /** Crawl-time loose name equality used as a data-quality assertion
    * (reference: crawl.py:264-299). Ported as written, including the
    * always-true `f1.lower() == f1.lower()` comparison at crawl.py:283 —
    * meaning equal last names always pass — to preserve the reference's
    * observable gating behavior (SURVEY.md §7 risk 6).
    */
  def assertNamesEqual(n1: Name, n2: Name): Boolean = {
    if (n1.first == n2.first) {
      val l1 = n1.last
      val l2 = n2.last
      if (l1.toLowerCase == l2.toLowerCase) return true
      if (l1.contains(s"$l2-") || l1.contains(s"-$l2")) return true
      false
    } else if (n1.last == n2.last) {
      // reference: `f1 in f2 or f2 in f1 or f1.lower() == f1.lower()` —
      // the third clause is always true, so equal lasts always match.
      true
    } else false
  }
}
