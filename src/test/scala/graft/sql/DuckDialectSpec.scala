package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the DuckDB→Spark translation kernel — the pure
  * string level; end-to-end row parity over the whole oracle corpus is
  * DialectParitySpec's job.
  */
class DuckDialectSpec extends AnyFunSuite {

  private def tr(s: String) = DuckDialect.translate(s)

  test("renames are call-position and word-boundary only") {
    assert(tr("SELECT string_split(t, ' ')") == "SELECT split(t, ' ')")
    assert(tr("SELECT strlen(t), len(ws)") == "SELECT length(t), size(ws)")
    // a column NAMED list is not a call
    assert(tr("SELECT list FROM t") == "SELECT list FROM t")
    assert(tr("SELECT list(x) FROM t") == "SELECT collect_list(x) FROM t")
    // epoch_us is not epoch
    assert(tr("SELECT epoch_us(ts), epoch(ts)") ==
      "SELECT unix_micros(ts), unix_seconds(ts)")
  }

  test("string literals pass through untouched except backslash doubling") {
    assert(tr("SELECT 'a // b' || x // y") == "SELECT 'a // b' || x  div  y")
    assert(tr("SELECT 'string_split(x)'") == "SELECT 'string_split(x)'")
    assert(tr("""SELECT regexp_extract(t, '\d+')""") ==
      """SELECT regexp_extract(t, '\\d+')""")
  }

  test("1-based indexing becomes element_at; slices become slice()") {
    assert(tr("SELECT ws[i]") == "SELECT element_at(ws, i)")
    assert(tr("SELECT ws[i+1] || a.qv[2]") ==
      "SELECT element_at(ws, i+1) || element_at(a.qv, 2)")
    assert(tr("SELECT cs[i:i+7]") == "SELECT slice(cs, i, (i+7) - (i) + 1)")
    // a call base binds through its balanced parens (quote inside!)
    assert(tr("SELECT string_split(t, ' ')[10:14]") ==
      "SELECT slice(split(t, ' '), 10, (14) - (10) + 1)")
    // open-ended slice: no single equivalent — untouched
    assert(tr("SELECT w[2:]") == "SELECT w[2:]")
    // literal list after non-identifier
    assert(tr("SELECT list_has_any(ws, ['a', 'b'])") ==
      "SELECT arrays_overlap(ws, array('a', 'b'))")
  }

  test("strftime maps codes inside the format argument only") {
    assert(tr("SELECT strftime(ts, '%Y-%m-%d %H:%M:%S')") ==
      "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss')")
    // a LIKE pattern with % stays a LIKE pattern
    assert(tr("SELECT x LIKE '%dark%'") == "SELECT x LIKE '%dark%'")
  }

  test("ordered aggregates fuse to listagg WITHIN GROUP") {
    assert(tr("SELECT array_to_string(list(e ORDER BY a, b), ',') FROM t") ==
      "SELECT listagg(e, ',') WITHIN GROUP (ORDER BY a, b) FROM t")
    assert(tr("SELECT string_agg(x, ' ' ORDER BY k) FROM t") ==
      "SELECT listagg(x, ' ') WITHIN GROUP (ORDER BY k) FROM t")
    // unordered forms keep their plain spellings
    assert(tr("SELECT array_to_string(xs, ',')") == "SELECT array_join(xs, ',')")
    assert(tr("SELECT string_agg(x, ',') FROM t") ==
      "SELECT string_agg(x, ',') FROM t")
  }

  test("call-shape rewrites: slice/date_diff/range/regexp/xor/dot-product") {
    assert(tr("SELECT list_slice(ws, 2, least(9, n))") ==
      "SELECT slice(ws, 2, (least(9, n)) - (2) + 1)")
    assert(tr("SELECT date_diff('day', a, b)") == "SELECT datediff(b, a)")
    assert(tr("SELECT datediff('day', a, b)") == "SELECT datediff(b, a)")
    assert(tr("SELECT range(1, n + 1)") == "SELECT sequence(1, (n + 1) - 1)")
    assert(tr("SELECT regexp_extract_all(t, 'x+')") ==
      "SELECT regexp_extract_all(t, 'x+', 0)")
    assert(tr("SELECT regexp_replace(t, 'a', 'b', 'g')") ==
      "SELECT regexp_replace(t, 'a', 'b')")
    assert(tr("SELECT xor(a, b)") == "SELECT (a ^ b)")
    assert(tr("SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), xs), (a, x) -> a + x)") ==
      "SELECT aggregate(xs, CAST(0 AS BIGINT), (a, x) -> a + x)")
  }

  test("FROM-comma unnest lateralizes; select-position unnest explodes") {
    assert(tr("SELECT i FROM w, unnest(generate_series(1, n)) AS u(i)") ==
      "SELECT i FROM w LATERAL VIEW explode(sequence(1, n)) u AS i")
    assert(tr("SELECT doc_id, unnest(ws) AS t FROM d") ==
      "SELECT doc_id, explode(ws) AS t FROM d")
  }

  test("QUALIFY wraps into a WHERE over the projected subquery") {
    assert(tr("WITH x AS (SELECT a, row_number() OVER (ORDER BY a) AS r FROM t QUALIFY r <= 5) SELECT * FROM x") ==
      "WITH x AS (SELECT * FROM (SELECT a, row_number() OVER (ORDER BY a) AS r FROM t) WHERE r <= 5) SELECT * FROM x")
  }

  test("misc token forms: MATERIALIZED, varchar, quoted alias, IGNORE NULLS, empty list cast") {
    assert(tr("WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a") ==
      "WITH a AS (SELECT 1) SELECT * FROM a")
    assert(tr("SELECT CAST(x AS VARCHAR), y::varchar") ==
      "SELECT CAST(x AS STRING), y::string")
    assert(tr("SELECT 1 AS \"offset\"") == "SELECT 1 AS `offset`")
    assert(tr("SELECT last_value(c IGNORE NULLS) OVER (ORDER BY d)") ==
      "SELECT last_value(c) IGNORE NULLS OVER (ORDER BY d)")
    assert(tr("SELECT []::BIGINT[]") == "SELECT CAST(array() AS ARRAY<BIGINT>)")
    assert(tr("SELECT * FROM read_parquet('/tmp/x/*.parquet')") ==
      "SELECT * FROM parquet.`/tmp/x/*.parquet`")
  }

  // ---- diagnosis mode (r8): named untranslatables raise a one-line
  // "needs a hand twin" answer from translateStrict instead of Spark's
  // construct-free parser error; translate itself stays total ----------

  private def constructs(s: String) =
    DuckDialect.diagnose(s).map(_.construct)

  test("diagnose: ASOF JOIN") {
    assert(constructs("SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.ts >= b.ts")
      === Seq("ASOF JOIN"))
    assert(constructs("SELECT * FROM a ASOF LEFT JOIN b ON a.ts >= b.ts")
      === Seq("ASOF JOIN"))
    // a column named asof is not the construct; a literal is not either
    assert(constructs("SELECT asof FROM t WHERE x = 'ASOF JOIN'").isEmpty)
  }

  test("diagnose: struct_pack") {
    assert(constructs("SELECT struct_pack(a := 1, b := x) FROM t")
      === Seq("struct_pack(...)"))
  }

  test("diagnose: open-ended slices, never closed ones") {
    assert(constructs("SELECT w[2:] FROM t")
      === Seq("open-ended slice `xs[i:]`/`xs[:j]`"))
    assert(constructs("SELECT w[:5] FROM t")
      === Seq("open-ended slice `xs[i:]`/`xs[:j]`"))
    assert(constructs("SELECT w[2:5] FROM t").isEmpty)
    assert(constructs("SELECT ws[i], cs[i:i+7] FROM t").isEmpty)
    // a ':' inside a literal inside the bracket is not a slice bound
    assert(constructs("SELECT m['a:b'] FROM t").isEmpty)
  }

  test("diagnose: top-level QUALIFY (unwrappable), not subquery QUALIFY") {
    assert(constructs("SELECT a, row_number() OVER (ORDER BY a) AS r FROM t QUALIFY r <= 5")
      === Seq("top-level QUALIFY"))
    // the subquery form rewrites fine — no diagnosis
    assert(constructs(
      "WITH x AS (SELECT a, row_number() OVER (ORDER BY a) AS r FROM t QUALIFY r <= 5) SELECT * FROM x")
      .isEmpty)
  }

  test("translateStrict throws naming every construct; translate stays total") {
    val bad = "SELECT struct_pack(a := w[2:]) FROM t ASOF JOIN u ON t.ts >= u.ts"
    val e = intercept[DuckDialect.UntranslatableSqlException] {
      DuckDialect.translateStrict(bad)
    }
    assert(e.diagnoses.map(_.construct).toSet ===
      Set("ASOF JOIN", "struct_pack(...)", "open-ended slice `xs[i:]`/`xs[:j]`"))
    assert(e.getMessage.contains("hand Spark twin"))
    // the total form still returns a string for the same input
    assert(DuckDialect.translate(bad).nonEmpty)
    // and the strict form translates clean queries identically
    val ok = "SELECT string_split(t, ' ')[1] FROM d"
    assert(DuckDialect.translateStrict(ok) === DuckDialect.translate(ok))
  }
}
