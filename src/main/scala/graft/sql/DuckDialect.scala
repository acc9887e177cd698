package graft.sql

/** Mechanical DuckDB → Spark SQL dialect translation — the porting tool
  * for raw-SQL callsites (the reference's embedded-database usage is all
  * raw SQL, e.g. its crawl/export query strings): feed a DuckDB-dialect
  * query in, get a Spark-SQL-runnable equivalent out for the mechanical
  * dialect gap:
  *
  *   - function renames (string_split→split, array_to_string→array_join,
  *     list_transform→transform, strlen→length, len→size,
  *     generate_series→sequence, strftime→date_format + format-code map,
  *     epoch/epoch_us→unix_seconds/unix_micros, quantile_cont→percentile,
  *     json_extract→get_json_object, list_sort/list_distinct→array_*…)
  *   - call-shape rewrites (list_slice's end-index → slice's length,
  *     date_diff('day', a, b) → datediff(b, a), xor(a,b) → (a ^ b),
  *     list_dot_product → aggregate∘zip_with, list_sum → aggregate,
  *     list_reduce(list_prepend(i, a), f) → aggregate(a, i, f),
  *     read_parquet('p') → parquet.`p`)
  *   - aggregate ORDER BY forms → listagg … WITHIN GROUP
  *     (string_agg(e, s ORDER BY k), array_to_string(list(e ORDER BY k), s))
  *   - FROM-clause `, unnest(x) AS a(c)` → `LATERAL VIEW explode(x) a AS c`
  *   - 1-based bracket indexing `xs[i]` → element_at(xs, i) (Spark's
  *     native `xs[i]` is 0-based — the silent off-by-one this rule exists
  *     to prevent)
  *   - `AS MATERIALIZED` → `AS`, `::varchar` → `::string`,
  *     `a // b` → `a div b` (floor vs truncate divide agree on the
  *     non-negative operands these queries use), `AS "x"` → backticks,
  *     `f(x IGNORE NULLS)` → `f(x) IGNORE NULLS`
  *
  * All rewrites are quote-aware (string literals pass through untouched —
  * a `//` inside a URL literal or a `%d` inside a LIKE pattern is never
  * rewritten). This is deliberately NOT a SQL parser: constructs with no
  * Spark structural equivalent (ASOF JOIN, IN-subquery in a SELECT list,
  * named-window refinement, `xs[2:]` slicing) pass through untranslated
  * — callers needing those shapes get a hand-written equivalent instead
  * (see the `Q.ansi` twins). [[diagnose]] detects the named ones and
  * [[translateStrict]] raises a one-line "needs a hand twin" error for
  * them up front, instead of letting Spark's parser produce a
  * construct-free error downstream.
  *
  * Every rule is verified end-to-end by DialectParitySpec, which pushes
  * the repo's whole DuckDB oracle corpus through this translator and
  * requires row-exact agreement with the operator results.
  */
object DuckDialect {

  /** One named untranslatable construct found by [[diagnose]]. */
  final case class Diagnosis(construct: String, snippet: String) {
    def message: String =
      s"DuckDB construct $construct has no Spark structural equivalent " +
        s"(at: `$snippet`) — write a hand Spark twin for this query " +
        "(the Q.ansi discipline)"
  }

  /** Raised by [[translateStrict]]: the query uses constructs no
    * mechanical rewrite can carry to Spark, each named with its
    * offending snippet — a one-line "needs a hand twin" answer instead
    * of the Spark parser/analyzer error the untranslated passthrough
    * would eventually hit.
    */
  final class UntranslatableSqlException(val diagnoses: Seq[Diagnosis])
    extends IllegalArgumentException(diagnoses.map(_.message).mkString("; "))

  /** Detect the NAMED untranslatable constructs — the ones [[translate]]
    * deliberately passes through (scaladoc above): ASOF JOIN,
    * `struct_pack` struct construction (Spark's named_struct twin needs
    * hand field mapping), open-ended `xs[i:]`/`xs[:j]` slices, and a
    * QUALIFY the subquery-wrap rewrite cannot own (top level of the
    * whole statement). Quote-aware like every rewrite; empty result =
    * [[translate]]'s output is expected to run (or the gap is a genuine
    * unknown, which the parity gate would surface as incompatible-set
    * drift).
    */
  def diagnose(sql: String): Seq[Diagnosis] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Diagnosis]
    def snippetAt(i: Int): String = {
      val from = math.max(0, i - 10)
      sql.substring(from, math.min(sql.length, i + 30)).replaceAll("\\s+", " ")
    }
    val asof = findTopWord(sql, "ASOF")
    if (asof >= 0 &&
        sql.substring(asof + 4).trim.toUpperCase.matches("(?s)(LEFT\\s+)?JOIN\\b.*"))
      out += Diagnosis("ASOF JOIN", snippetAt(asof))
    val sp = findTopWord(sql, "STRUCT_PACK")
    if (sp >= 0) out += Diagnosis("struct_pack(...)", snippetAt(sp))
    // open-ended slices: an INDEXED bracket whose top-level ':' has an
    // empty bound — exactly the case rebaseIndexing leaves untouched
    var i = 0; var inQ = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '[' && i > 0 &&
          (isIdentChar(sql.charAt(i - 1)) || sql.charAt(i - 1) == ')')) {
        var depth = 1; var j = i + 1; var q = false; var colon = false
        while (j < sql.length && depth > 0) {
          val cj = sql.charAt(j)
          if (q) { if (cj == '\'') q = false }
          else cj match {
            case '\'' => q = true
            case '[' => depth += 1
            case ']' => depth -= 1
            case ':' if depth == 1 => colon = true
            case _ =>
          }
          j += 1
        }
        if (depth == 0 && colon) {
          val openEnded = splitTopLevelChar(sql.substring(i + 1, j - 1), ':')
            .exists { case (lo, hi) => lo.trim.isEmpty || hi.trim.isEmpty }
          if (openEnded)
            out += Diagnosis("open-ended slice `xs[i:]`/`xs[:j]`", snippetAt(i))
        }
        i = j - 1
      }
      i += 1
    }
    val q = findTopWord(sql, "QUALIFY")
    if (q >= 0) {
      // owned by no '(': the subquery-wrap rewrite has nothing to wrap
      var depth = 0; var inQ2 = false; var owned = false
      (0 until q).foreach { k =>
        val c = sql.charAt(k)
        if (inQ2) { if (c == '\'') inQ2 = false }
        else c match {
          case '\'' => inQ2 = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
      }
      owned = depth > 0
      if (!owned)
        out += Diagnosis("top-level QUALIFY", snippetAt(q))
    }
    out.toSeq
  }

  /** [[translate]] with the untranslatable gate in front: throws
    * [[UntranslatableSqlException]] naming every detected construct
    * instead of handing Spark a query that will die in its parser with
    * a construct-free error. [[translate]] itself stays TOTAL — the
    * parity gate pushes the full oracle corpus through it and pins the
    * residual incompatibles by name.
    */
  def translateStrict(sql: String): String = {
    val d = diagnose(sql)
    if (d.nonEmpty) throw new UntranslatableSqlException(d)
    translate(sql)
  }

  def translate(sql: String): String = {
    var s = sql
    // DuckDB string literals are escape-free (standard SQL); Spark
    // processes C-style backslash escapes by default, so every literal
    // backslash must double or a regex like '\b…' silently becomes a
    // backspace character
    s = doubleBackslashesInLiterals(s)
    // ---- structural forms first (before renames could shadow them) ----
    s = s.replaceAll("(?i)\\bAS\\s+MATERIALIZED\\b", "AS")
    s = lateralizeUnnest(s)
    // aggregate-ORDER-BY fusions (consume list(...) before its rename)
    s = rewriteCalls(s, "array_to_string") { args =>
      orderedAgg(args.head) match {
        case Some((e, k)) if args.size == 2 =>
          s"listagg(${e}, ${args(1)}) WITHIN GROUP (ORDER BY $k)"
        case _ => s"array_join(${args.mkString(", ")})"
      }
    }
    s = rewriteCalls(s, "string_agg") { args =>
      if (args.size == 2) splitTopLevel(args(1), "ORDER BY") match {
        case Some((sep, k)) => s"listagg(${args.head}, $sep) WITHIN GROUP (ORDER BY $k)"
        case None => s"string_agg(${args.mkString(", ")})"
      } else s"string_agg(${args.mkString(", ")})"
    }
    // list_reduce(list_prepend(init, xs), f) — DuckDB's seeded fold —
    // IS Spark's aggregate(xs, init, f)
    s = rewriteCalls(s, "list_reduce") { args =>
      val inner = parseCall(args.head, "list_prepend")
      inner match {
        case Some(Seq(init, xs)) => s"aggregate($xs, $init, ${args(1)})"
        case _ => s"list_reduce(${args.mkString(", ")})" // no seedless Spark fold
      }
    }
    s = rewriteCalls(s, "list_slice") { args =>
      s"slice(${args(0)}, ${args(1)}, (${args(2)}) - (${args(1)}) + 1)"
    }
    s = rewriteCalls(s, "list_dot_product") { args =>
      s"aggregate(zip_with(${args(0)}, ${args(1)}, (_dx, _dy) -> _dx * _dy), " +
        "CAST(0 AS DOUBLE), (_da, _dv) -> _da + _dv)"
    }
    s = rewriteCalls(s, "list_sum") { args =>
      s"aggregate(${args.head}, CAST(0 AS BIGINT), (_da, _dv) -> _da + _dv)"
    }
    s = rewriteCalls(s, "list_prepend") { args =>
      s"concat(array(${args(0)}), ${args(1)})"
    }
    s = rewriteCalls(s, "date_diff") { args =>
      if (args.head.equalsIgnoreCase("'day'") && args.size == 3)
        s"datediff(${args(2)}, ${args(1)})"
      else s"date_diff(${args.mkString(", ")})"
    }
    // DuckDB's datediff alias takes a quoted unit; Spark's wants it bare
    // (and reversed args for the 2-arg day form)
    s = rewriteCalls(s, "datediff") { args =>
      if (args.size == 3 && args.head.equalsIgnoreCase("'day'"))
        s"datediff(${args(2)}, ${args(1)})"
      else s"datediff(${args.mkString(", ")})"
    }
    s = rewriteCalls(s, "xor") { args => s"(${args(0)} ^ ${args(1)})" }
    s = rewriteCalls(s, "strftime") { args =>
      s"date_format(${args(0)}, ${mapTimeFormat(args(1))})"
    }
    s = rewriteCalls(s, "read_parquet") { args =>
      val p = args.head.stripPrefix("'").stripSuffix("'")
      s"parquet.`$p`"
    }
    // DuckDB's default extraction group is 0 (full match); Spark's is 1,
    // which ERRORS on group-less patterns — pin the DuckDB default
    s = rewriteCalls(s, "regexp_extract_all") { args =>
      if (args.size == 2) s"regexp_extract_all(${args(0)}, ${args(1)}, 0)"
      else s"regexp_extract_all(${args.mkString(", ")})"
    }
    // DuckDB's 'g' flag = replace all; Spark replaces all by default and
    // reads a 4th argument as a START POSITION (cast error on 'g')
    s = rewriteCalls(s, "regexp_replace") { args =>
      if (args.size == 4 && args(3).equalsIgnoreCase("'g'"))
        s"regexp_replace(${args(0)}, ${args(1)}, ${args(2)})"
      else s"regexp_replace(${args.mkString(", ")})"
    }
    // DuckDB sha256(x) → Spark sha2(x, 256) (Spark has no 1-arg alias)
    s = rewriteCalls(s, "sha256") { args =>
      if (args.size == 1) s"sha2(${args.head}, 256)"
      else s"sha256(${args.mkString(", ")})"
    }
    // DuckDB chr(n) is the Unicode code point; Spark's chr is mod-256
    // ASCII (chr(769) = chr(1), not the combining acute) — fold
    // constant BMP code points into a \uXXXX string literal, which
    // Spark's parser unescapes
    s = rewriteCalls(s, "chr") { args =>
      args match {
        case Seq(n) if n.matches("\\d+") && n.toInt >= 32 && n.toInt <= 0xFFFF =>
          f"'\\u${n.toInt}%04X'"
        case _ => s"chr(${args.mkString(", ")})"
      }
    }
    // DuckDB range(a, b) is end-EXCLUSIVE; Spark sequence is inclusive
    s = rewriteCalls(s, "range") { args =>
      if (args.size == 2) s"sequence(${args(0)}, (${args(1)}) - 1)"
      else s"range(${args.mkString(", ")})"
    }
    // ---- plain renames ----
    Seq(
      "string_split" -> "split", "list_transform" -> "transform",
      "list_filter" -> "filter", "list_max" -> "array_max",
      "list_min" -> "array_min", "list_contains" -> "array_contains",
      "list_sort" -> "array_sort", "list_distinct" -> "array_distinct",
      "list_extract" -> "element_at", "strlen" -> "length", "len" -> "size",
      "generate_series" -> "sequence", "quantile_cont" -> "percentile",
      "json_extract_string" -> "get_json_object",
      "json_extract" -> "get_json_object", "epoch_us" -> "unix_micros",
      "epoch_ms" -> "unix_millis", "epoch" -> "unix_seconds",
      "list" -> "collect_list", "unnest" -> "explode",
      // DuckDB's NFC normalizer → the graft_nfc native expression the
      // GraftExtensions session registers (NfcNormalize.scala); the
      // translated form needs a Sessions/GraftExtensions session, which
      // the parity gate and Verify both run on
      "nfc_normalize" -> "graft_nfc"
    ).foreach { case (from, to) => s = renameFn(s, from, to) }
    s = rewriteQualify(s)
    // ---- token-level forms ----
    s = replaceOutsideQuotes(s, "//", " div ")
    s = s.replaceAll("(?i)::\\s*varchar\\b", "::string")
    s = s.replaceAll("(?i)\\bAS\\s+VARCHAR\\b", "AS STRING")
    s = s.replaceAll("(?i)\\[\\]\\s*::\\s*(\\w+)\\s*\\[\\]",
      "CAST(array() AS ARRAY<$1>)")
    s = renameFn(s, "list_has_any", "arrays_overlap")
    s = s.replaceAll("(?i)\\bAS\\s+\"([A-Za-z_][A-Za-z0-9_]*)\"", "AS `$1`")
    s = s.replaceAll("(?i)\\(([A-Za-z0-9_.]+)\\s+IGNORE\\s+NULLS\\)",
      "($1) IGNORE NULLS")
    s = rebaseIndexing(s)
    s
  }

  /** `f(x)` occurrences renamed to `g(x)` (word-boundary, call position
    * only — a column named `list` without a following paren is left be;
    * quote-aware — a literal containing "string_split(" survives).
    */
  private def renameFn(sql: String, from: String, to: String): String = {
    val pat = java.util.regex.Pattern
      .compile(s"(?i)(?<![A-Za-z0-9_])$from\\s*\\(")
    val spans = literalSpans(sql)
    def inLit(p: Int) = spans.exists { case (a, z) => p >= a && p <= z }
    val m = pat.matcher(sql)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) if (!inLit(m.start())) {
      sb.append(sql, last, m.start()).append(to).append('(')
      last = m.end()
    }
    sb.append(sql, last, sql.length).toString
  }

  /** DuckDB strftime codes → JVM DateTimeFormatter patterns, applied only
    * to the format argument of an strftime call (never to arbitrary
    * literals, where `%d` might be LIKE syntax).
    */
  private def mapTimeFormat(lit: String): String =
    Seq("%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
        "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")
      .foldLeft(lit) { case (acc, (c, p)) => acc.replace(c, p) }

  /** `FROM t, unnest(X) AS a(c)` → `FROM t LATERAL VIEW explode(X) a AS c`
    * (the trailing-generator comma-join shape; repeated for stacked
    * generators).
    */
  private def lateralizeUnnest(sql: String): String = {
    val pat = java.util.regex.Pattern
      .compile("(?i),\\s*unnest\\s*\\(")
    var s = sql
    var guard = 0
    var m = pat.matcher(s)
    while (m.find() && guard < 100) {
      guard += 1
      val open = s.indexOf('(', m.start())
      val close = matchParen(s, open)
      val tail = s.substring(close + 1)
      val asPat = java.util.regex.Pattern
        .compile("(?i)^\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)")
      val am = asPat.matcher(tail)
      if (close > 0 && am.find()) {
        val arg = s.substring(open + 1, close)
        s = s.substring(0, m.start()) +
          s" LATERAL VIEW explode($arg) ${am.group(1)} AS ${am.group(2)}" +
          tail.substring(am.end())
        m = pat.matcher(s)
      } // a non-matching tail (no AS alias(col)) is left for the plain
        // unnest→explode rename; don't loop on it
      else return s
    }
    s
  }

  /** Bracket forms, all 1-based in DuckDB:
    *   `xs[i]`   → `element_at(xs, i)` (Spark's native `xs[i]` indexes
    *               from ZERO — the one translation that, skipped, gives
    *               silently wrong answers rather than an error)
    *   `xs[a:b]` → `slice(xs, a, b − a + 1)` (DuckDB's end-inclusive
    *               slice vs Spark's start+length)
    *   `[a, b]`  → `array(a, b)` (list literal — recognized by a
    *               non-identifier character before the bracket)
    * Open-ended slices (`xs[2:]`) have no single equivalent (substring
    * for strings, slice for arrays) and are left untouched. Quote-aware.
    */
  private def rebaseIndexing(sql: String): String = {
    var s = sql
    var i = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '[') {
        val indexed = i > 0 &&
          (isIdentChar(s.charAt(i - 1)) || s.charAt(i - 1) == ')')
        // scan forward to the matching bracket
        var depth = 1; var j = i + 1; var q = false; var colon = false
        while (j < s.length && depth > 0) {
          val cj = s.charAt(j)
          if (q) { if (cj == '\'') q = false }
          else cj match {
            case '\'' => q = true
            case '[' => depth += 1
            case ']' => depth -= 1
            case ':' if depth == 1 => colon = true
            case _ =>
          }
          j += 1
        }
        val inner = if (depth == 0) s.substring(i + 1, j - 1) else ""
        if (depth == 0 && inner.trim.nonEmpty) {
          if (!indexed) {
            s = s.substring(0, i) + s"array($inner)" + s.substring(j)
            // continue scanning INSIDE the emitted args (nested forms)
          } else {
            // scan back over the base: a call's balanced parens (using
            // forward-computed literal spans — backward quote tracking is
            // ambiguous) plus the leading qualified identifier
            var b = i
            if (s.charAt(i - 1) == ')') {
              val lit = literalSpans(s)
              def inLit(p: Int) = lit.exists { case (a, z) => p >= a && p <= z }
              var depth = 0; b = i
              while (b > 0 && (depth != 0 || b == i)) {
                b -= 1
                if (!inLit(b)) s.charAt(b) match {
                  case ')' => depth += 1
                  case '(' => depth -= 1
                  case _ =>
                }
              }
            }
            while (b > 0 && (isIdentChar(s.charAt(b - 1)) || s.charAt(b - 1) == '.')) b -= 1
            val base = s.substring(b, i)
            if (!colon) {
              s = s.substring(0, b) + s"element_at($base, $inner)" + s.substring(j)
              i = b // rescan from the rewrite (idx may itself index)
            } else splitTopLevelChar(inner, ':') match {
              case Some((lo, hi)) if lo.trim.nonEmpty && hi.trim.nonEmpty =>
                s = s.substring(0, b) +
                  s"slice($base, ${lo.trim}, (${hi.trim}) - (${lo.trim}) + 1)" +
                  s.substring(j)
                i = b
              case _ => i = j - 1 // open-ended slice: leave untouched
            }
          }
        }
      }
      i += 1
    }
    s
  }

  /** Inclusive (start, end) spans of every single-quoted literal. */
  private def literalSpans(s: String): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0; var start = -1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (start < 0) start = i
        else { out += ((start, i)); start = -1 }
      }
      i += 1
    }
    out.toSeq
  }

  /** Split at the first top-level occurrence of a single character. */
  private def splitTopLevelChar(s: String, sep: Char): Option[(String, String)] = {
    var depth = 0; var inQ = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case `sep` if depth == 0 =>
          return Some((s.substring(0, i), s.substring(i + 1)))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** `(SELECT … QUALIFY cond)` → `(SELECT * FROM (SELECT …) WHERE cond)`
    * — Spark has no QUALIFY; the wrap makes the window-column filter an
    * ordinary WHERE over the materialized projection.
    */
  private def rewriteQualify(sql: String): String = {
    var s = sql
    var guard = 0
    while (guard < 50) {
      guard += 1
      val q = findTopWord(s, "QUALIFY")
      if (q < 0) return s
      // the '(' owning this QUALIFY: scan from the start tracking depth,
      // remembering the innermost unclosed '(' before position q
      var depth = 0; var inQ = false
      val opens = scala.collection.mutable.ArrayDeque.empty[Int]
      (0 until q).foreach { i =>
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => opens.append(i); depth += 1
          case ')' => if (opens.nonEmpty) opens.removeLast(); depth -= 1
          case _ =>
        }
      }
      if (opens.isEmpty) return s
      val open = opens.last
      val close = matchParen(s, open)
      if (close < 0) return s
      val body = s.substring(open + 1, q).trim
      val cond = s.substring(q + "QUALIFY".length, close).trim
      s = s.substring(0, open) + s"(SELECT * FROM ($body) WHERE $cond)" +
        s.substring(close + 1)
    }
    s
  }

  /** First top-level (outside quotes/parens-agnostic) keyword position. */
  private def findTopWord(s: String, word: String): Int = {
    val upper = s.toUpperCase
    var inQ = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (upper.startsWith(word, i) &&
          (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
          (i + word.length >= s.length || !isIdentChar(s.charAt(i + word.length))))
        return i
      i += 1
    }
    -1
  }

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** `'a\b'` → `'a\\b'`: preserve DuckDB's escape-free literal semantics
    * under Spark's C-style literal parsing.
    */
  private def doubleBackslashesInLiterals(sql: String): String = {
    val out = new StringBuilder
    var inQ = false
    sql.foreach { c =>
      if (c == '\'') inQ = !inQ
      if (c == '\\' && inQ) out ++= "\\\\" else out += c
    }
    out.toString
  }

  /** Literal token replacement that never reaches inside string literals
    * (a `//` in a URL constant must survive translation).
    */
  private def replaceOutsideQuotes(sql: String, from: String, to: String): String = {
    val out = new StringBuilder
    var i = 0; var inQ = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inQ && sql.startsWith(from, i)) { out ++= to; i += from.length }
      else {
        if (inQ) { if (c == '\'') inQ = false }
        else if (c == '\'') inQ = true
        out += c; i += 1
      }
    }
    out.toString
  }

  /** Index of the ')' matching the '(' at `open`; −1 if unbalanced. */
  private def matchParen(s: String, open: Int): Int = {
    var i = open; var depth = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Top-level comma split of an argument list (quote- and paren-aware). */
  private def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQ = false; var start = 0
    (0 until s.length).foreach { i =>
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
    }
    out += s.substring(start)
    out.map(_.trim).toSeq
  }

  /** Split `s` at the first TOP-LEVEL occurrence of `word` (e.g.
    * "ORDER BY"), returning (before, after) — None when absent or nested.
    */
  private def splitTopLevel(s: String, word: String): Option[(String, String)] = {
    val upper = s.toUpperCase
    val target = word.toUpperCase
    var depth = 0; var inQ = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(target, i) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              (i + target.length >= s.length || !isIdentChar(s.charAt(i + target.length))))
            return Some((s.substring(0, i).trim, s.substring(i + target.length).trim))
      }
      i += 1
    }
    None
  }

  /** If `expr` is exactly a call `fn(args…)`, its top-level args. */
  private def parseCall(expr: String, fn: String): Option[Seq[String]] = {
    val t = expr.trim
    val pat = java.util.regex.Pattern.compile(s"(?i)^$fn\\s*\\(")
    val m = pat.matcher(t)
    if (!m.find()) return None
    val open = t.indexOf('(', 0)
    val close = matchParen(t, open)
    if (close != t.length - 1) None
    else Some(splitArgs(t.substring(open + 1, close)))
  }

  /** `list(e ORDER BY k1, k2…)` → Some((e, keys)) — the ordered-collect
    * shape that fuses with a joining separator into listagg WITHIN GROUP.
    * (Top-level commas belong to the ORDER BY key list, so the args are
    * re-joined before the split.)
    */
  private def orderedAgg(expr: String): Option[(String, String)] =
    parseCall(expr, "list")
      .flatMap(args => splitTopLevel(args.mkString(", "), "ORDER BY"))

  /** Rewrite every `fn(args…)` via `f` (quote-aware balanced-paren arg
    * extraction; bounded rescan so a rule emitting its own name cannot
    * loop).
    */
  private def rewriteCalls(sql: String, fn: String)(f: Seq[String] => String): String = {
    val pat = java.util.regex.Pattern.compile(s"(?i)(?<![A-Za-z0-9_])$fn\\s*\\(")
    var s = sql
    var from = 0
    var guard = 0
    while (guard < 500) {
      guard += 1
      val m = pat.matcher(s)
      if (!m.find(from)) return s
      val spans = literalSpans(s)
      if (spans.exists { case (a, z) => m.start() >= a && m.start() <= z }) {
        from = m.end(); guard -= 1
        if (from >= s.length) return s
      } else {
        val open = s.indexOf('(', m.start())
        val close = matchParen(s, open)
        if (close < 0) return s
        val replaced = f(splitArgs(s.substring(open + 1, close)))
        s = s.substring(0, m.start()) + replaced + s.substring(close + 1)
        // a rule that emits its own name (identity / partial rewrite)
        // must not be re-matched at the same spot; anything else is
        // rescanned in place because the replacement's args may hold
        // further instances
        from =
          if (replaced.toLowerCase.matches(s"(?s)^${fn.toLowerCase}\\s*\\(.*"))
            m.start() + fn.length
          else m.start()
      }
    }
    s
  }
}
