package graft.votes

/** Static nickname dictionary + the reference's nickname predicate
  * (reference: names.py:6-8, names.py:35-49). The reference resolves
  * nicknames through the public `nicknames` PyPI dataset; we ship a curated
  * static table of common American given-name nicknames (public knowledge)
  * keyed by canonical name, covering the names that occur in the corpus.
  */
object Nicknames {

  /** canonical (capitalized) → lowercase nickname set */
  private val table: Map[String, Set[String]] = Map(
    "Thomas" -> Set("tom", "tommy", "thom"),
    "Michael" -> Set("mike", "mick", "mickey"),
    "William" -> Set("bill", "billy", "will", "willie", "liam"),
    "Robert" -> Set("bob", "bobby", "rob", "robby", "bert"),
    "James" -> Set("jim", "jimmy", "jamie"),
    "Daniel" -> Set("dan", "danny"),
    "David" -> Set("dave", "davey"),
    "Christopher" -> Set("chris", "kit", "topher"),
    "Timothy" -> Set("tim", "timmy"),
    "Anthony" -> Set("tony"),
    "Edward" -> Set("ed", "eddie", "ted", "ned"),
    "Richard" -> Set("rick", "ricky", "dick", "rich"),
    "Gregory" -> Set("greg"),
    "Jeffrey" -> Set("jeff"),
    "Steven" -> Set("steve"),
    "Stephen" -> Set("steve"),
    "Joseph" -> Set("joe", "joey"),
    "Frederick" -> Set("fred", "freddie"),
    "Theodore" -> Set("ted", "teddy"),
    "Matthew" -> Set("matt"),
    "Patrick" -> Set("pat", "paddy"),
    "Samuel" -> Set("sam", "sammy"),
    "Stanley" -> Set("stan"),
    "Bernard" -> Set("bernie", "bern"),
    "Jacob" -> Set("jake"),
    "Joshua" -> Set("josh"),
    "Gerald" -> Set("jerry"),
    "Lawrence" -> Set("larry"),
    "Kenneth" -> Set("ken", "kenny"),
    "Ronald" -> Set("ron", "ronnie"),
    "Donald" -> Set("don", "donnie"),
    "Douglas" -> Set("doug"),
    "Andrew" -> Set("andy", "drew"),
    "Nicholas" -> Set("nick"),
    "John" -> Set("jack", "johnny"),
    "Jonathan" -> Set("jon"),
    "Nathaniel" -> Set("nate", "nat"),
    "Nathan" -> Set("nate"),
    "Martin" -> Set("marty"),
    "Vincent" -> Set("vince", "vinny"),
    "Eugene" -> Set("gene"),
    "Henry" -> Set("hank", "harry"),
    "Harold" -> Set("harry", "hal"),
    "Charles" -> Set("charlie", "chuck"),
    "Benjamin" -> Set("ben", "benny"),
    "Alexander" -> Set("alex"),
    "Peter" -> Set("pete"),
    "Philip" -> Set("phil"),
    "Raymond" -> Set("ray"),
    "Walter" -> Set("walt", "wally"),
    "Louis" -> Set("lou"),
    "Leonard" -> Set("len", "lenny"),
    "Albert" -> Set("al"),
    "Alfred" -> Set("al"),
    "Arthur" -> Set("art"),
    "Francis" -> Set("fran", "frank"),
    "Zachary" -> Set("zach"),
    "Kathleen" -> Set("kathy", "kate"),
    "Katherine" -> Set("kathy", "kate", "katie", "kay"),
    "Margaret" -> Set("peg", "peggy", "maggie", "meg"),
    "Elizabeth" -> Set("liz", "beth", "betsy", "betty"),
    "Rebecca" -> Set("becky"),
    "Deborah" -> Set("debbie", "deb"),
    "Susan" -> Set("sue", "susie"),
    "Jennifer" -> Set("jen", "jenny"),
    "Patricia" -> Set("pat", "patty", "tricia"),
    "Christine" -> Set("chris", "christy"),
    "Christina" -> Set("chris", "tina", "christy"),
    "Cynthia" -> Set("cindy"),
    "Pamela" -> Set("pam"),
    "Sandra" -> Set("sandy"),
    "Victoria" -> Set("vicky"),
    "Jacqueline" -> Set("jackie"),
    "Judith" -> Set("judy"),
    "Kimberly" -> Set("kim"),
    "Stephanie" -> Set("steph"),
    "Angela" -> Set("angie"),
    "Amanda" -> Set("mandy"),
    "Abigail" -> Set("abby"))

  /** lowercase nicknames of a canonical name (empty set if unknown) —
    * mirrors `nn.nicknames_of` (names.py:38).
    */
  def nicknamesOf(name: String): Set[String] = {
    val cap = if (name.isEmpty) name
    else name.substring(0, 1).toUpperCase + name.substring(1).toLowerCase
    table.getOrElse(cap, Set.empty)
  }

  /** Names whose nickname relation is asymmetric by fiat
    * (reference: names.py:6).
    */
  private val LongNames = Set("Michael", "Timothy", "Christopher", "Robert", "Thomas")

  /** Hard-coded special-case pairs (reference: names.py:36). */
  private val SpecialPairs = Set(("Tommy", "Thomas"), ("Stan", "Stanley"))

  final class AmbiguousNicknameException(msg: String) extends RuntimeException(msg)

  /** Is `first1` a nickname of `first2`? Ports names.py:35-49 exactly,
    * including the LONG_NAMES tiebreak for bidirectional hits; the
    * reference aborts the process on unresolvable ambiguity — we raise.
    */
  def isNicknameOf(first1: String, first2: String): Boolean = {
    if (SpecialPairs.contains((first1, first2))) return true
    if (nicknamesOf(first2).contains(first1.toLowerCase)) {
      if (nicknamesOf(first1).contains(first2.toLowerCase)) {
        if (LongNames.contains(first2)) true
        else if (LongNames.contains(first1)) false
        else throw new AmbiguousNicknameException(s"Ambiguous Nicknames: $first1 vs. $first2")
      } else true
    } else false
  }
}
