package graft.votes

/** A structured person name, with HumanName-style empty-string semantics
  * for missing parts (reference: names.py:5, names.py:11-32). Null-free:
  * conversion from nullable storage happens at the DataFrame boundary.
  */
final case class Name(first: String = "", middle: String = "",
                      last: String = "", suffix: String = "") {
  /** Display form: non-empty parts joined by single spaces — matches the
    * reference's `str(HumanName)` used for CSV headers (dump.py:76).
    */
  def display: String =
    Seq(first, middle, last, suffix).filter(_.nonEmpty).mkString(" ")
  def isEmpty: Boolean = display.isEmpty
}

object Name {
  /** Suffix tokens recognized by the minimal parser; mirrors the subset of
    * nameparser's suffix list that occurs in the reference corpus
    * (generational suffixes, with and without trailing dot).
    */
  private val Suffixes: Set[String] =
    Set("jr", "sr", "ii", "iii", "iv", "v", "vi", "2nd", "3rd", "4th")

  private def isSuffix(tok: String): Boolean =
    Suffixes.contains(tok.toLowerCase.stripSuffix("."))

  /** Minimal HumanName-equivalent parser for the name forms present in the
    * reference corpus (reference: crawl.py:246-261 builds names via
    * `HumanName(s)`): "First Last", "First M. Last", "First Mid Last",
    * trailing generational suffix, "Last, First [Suffix]" comma form, and
    * the bare single token (HumanName treats it as a first name).
    * Multi-token middles ("Carrie A. Lewis DelRosso" → middle "A. Lewis")
    * follow HumanName's first/…middle…/last split.
    */
  def parse(raw: String): Name = {
    val s = raw.trim.replaceAll("\\s+", " ")
    if (s.isEmpty) return Name()
    if (s.contains(",")) {
      val Array(lastPart, rest @ _*) = s.split(",", -1).map(_.trim): @unchecked
      val toks = rest.filter(_.nonEmpty).flatMap(_.split(" ")).toList
      val (suffixes, core) = toks.partition(isSuffix)
      core match {
        case Nil => Name(last = lastPart, suffix = suffixes.mkString(" "))
        case f :: mids =>
          Name(first = f, middle = mids.mkString(" "), last = lastPart,
            suffix = suffixes.mkString(" "))
      }
    } else {
      val toks = s.split(" ").toList
      val (core, suffixToks) = {
        // peel suffix tokens off the tail only (a leading "Van" etc. stays)
        val rev = toks.reverse
        val sufs = rev.takeWhile(isSuffix)
        (rev.dropWhile(isSuffix).reverse, sufs.reverse)
      }
      val name = core match {
        case Nil => Name(suffix = suffixToks.mkString(" "))
        case single :: Nil => Name(first = single)
        case f :: rest =>
          Name(first = f, middle = rest.init.mkString(" "), last = rest.last)
      }
      name.copy(suffix = suffixToks.mkString(" "))
    }
  }
}
