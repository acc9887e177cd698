package graft

import org.apache.spark.sql.{DataFrame, Row}
import scala.util.control.NonFatal

/** SQL-frontend breadth gate: every `oracleSql` entry must run through
  * `spark.sql` over the same tables — as written, via its hand-written
  * `oracleSqlAnsi` twin, or via the mechanical
  * [[graft.sql.DuckDialect]] DuckDB→Spark translation — and whatever
  * form runs must produce EXACTLY the rows of its DataFrame entry. A
  * user porting raw-SQL callsites (the reference's embedded-db usage is
  * all raw SQL) gets this corpus as the tested dialect surface, and the
  * translator as the porting tool.
  *
  * Classification is DYNAMIC per oracle: first runnable form wins
  * (ansi twin > raw > translated — a twin exists precisely because the
  * raw/translated forms don't run). Anything that RUNS must MATCH; the
  * residual incompatible set is pinned by NAME (set equality, not just a
  * floor) so a single new regression is called out by name.
  * `knownDifferent` is the manual escape hatch for oracles that run on
  * both engines with different semantics; it is EMPTY — there are none.
  */
class DialectParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** name → reason, for oracles that execute under Spark SQL but are
    * allowed to differ. Kept empty on purpose: add an entry only with a
    * documented engine-semantics difference.
    */
  private val knownDifferent: Map[String, String] = Map.empty

  /** The residual DuckDB-only oracles — shapes with no mechanical
    * translation AND no hand twin yet, pinned by name: a new entry here
    * is a dialect regression the gate must name, not a count to shrink
    * past a floor. Each carries its reason.
    */
  private val expectedIncompatible: Set[String] = Set(
    // recursive CTE with UNION (dedup) — Spark 4 supports only UNION ALL
    // in recursion, and connected-components needs the dedup to converge
    // on a cyclic graph; the Spark-native form is ops/Components (d7b
    // shares d7's oracle verbatim, so it pins with it)
    "d7_dedup_components", "d7b_components_bigstar", "d9_dedup_select",
    // unrolled iterative oracles whose rounds reference the previous
    // round 2-3 times under AS MATERIALIZED — Spark has no CTE
    // materialization hint, so any SQL form inlines 3^rounds copies of
    // the scan; the Spark-native form is the checkpointed DataFrame loop
    // each entry already is (ops/KCore, ops/Bfs, ops/Sssp)
    "g4b_kcore_converge", "g6_bfs_distances",
    "g7_sssp_relax", "g7b_sssp_converge",
    // r8: same MATERIALIZED rationale — each BPE round references the
    // previous one twice (pair count + re-segmentation), 2^rounds
    // inlining without the hint; the Spark-native form is
    // TextStats.bpeTrain's checkpointed driver loop (x16c replays the
    // same training chain before encoding)
    "x16b_bpe_train", "x16c_bpe_encode")

  /** check.py's canon: columns sorted by name, every value stringified
    * (floats that are whole print as ints), rows sorted — so "equal"
    * here is the same equivalence the driver's gate hashes.
    */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    val re = df.select(cols.map(df.col): _*)
    def num(d: Double): String =
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else f"$d%.9e"
    def v(x: Any): String = x match {
      case null => "NULL"
      case d: Double => num(d)
      case f: Float => num(f.toDouble)
      // Spark SQL types `bigint / 100.0` as decimal (the literal parses
      // as decimal(4,1)) where the Column form's lit(100.0) is a double —
      // same values, different carrier; normalize through double
      case d: java.math.BigDecimal => num(d.doubleValue)
      case b: Boolean => if (b) "1" else "0"
      case s: Seq[_] => s.map(v).mkString("[", ",", "]")
      case r: Row => r.toSeq.map(v).mkString("(", ",", ")")
      case other => other.toString
    }
    // NUL-joined sort key: mkString("") is not injective (("1","23") vs
    // ("12","3") collide), and colliding keys let the two sides' tied
    // rows interleave differently — a spurious mismatch
    re.collect().toSeq.map(_.toSeq.map(v)).sortBy(_.mkString("\u0000"))
  }

  test("every oracle runs under Spark SQL (raw, twin, or translated) and matches") {
    def registerViews(): Unit = Tables.names.foreach { n =>
      Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }
    val withOracle = SparkEntry.queries.keys.toSeq.sorted
      .flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
    var raw = List.empty[String]
    var twin = List.empty[String]
    var translated = List.empty[String]
    var incompatible = List.empty[(String, String)]
    var mismatched = List.empty[(String, String)]
    withOracle.foreach { case (name, sql) =>
      // fatal errors (OOM, linkage) must fail the suite, not be recorded
      // as "dialect-incompatible"
      def tryRun(q: String): Either[String, Seq[Seq[String]]] =
        try Right(canon(spark.sql(q)))
        catch { case NonFatal(e) =>
          Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120))
        }
      // re-register per oracle: an entry body (sql1-style) may have
      // redefined a view between iterations
      registerViews()
      Console.out.println(s"[parity] $name"); Console.out.flush()
      // the DataFrame entry runs FIRST: entries that persist scratch
      // state (m4b's fingerprint parquet) must have written it before
      // any SQL replay reads it
      val viaDf = canon(SparkEntry.queries(name)(spark, dir))
      val ansi = SparkEntry.oracleSqlAnsi.get(name)
      // `AS MATERIALIZED` marks CTE materialization as LOAD-BEARING:
      // these are the unrolled iterative oracles whose rounds reference
      // the previous round 2-3 times — Spark has no materialization
      // hint, so a translated form inlines 3^rounds copies of the scan
      // and the analyzer blows up. The Spark-native form of an iterative
      // computation is the checkpointed DataFrame loop the entry already
      // is; the oracle stays honestly DuckDB-only.
      val translatable = !sql.toUpperCase.contains("MATERIALIZED")
      val attempts: Seq[(String, String)] =
        ansi.map("twin" -> _).toSeq ++ Seq("raw" -> sql) ++ {
          val t = graft.sql.DuckDialect.translate(sql)
          if (translatable && t != sql) Seq("translated" -> t) else Seq.empty
        }
      val outcomes = attempts.map { case (kind, q) => (kind, q, tryRun(q)) }
      outcomes.collectFirst { case (kind, _, Right(rows)) => (kind, rows) } match {
        case None =>
          incompatible ::= (name, outcomes.map {
            case (k, _, Left(r)) => s"$k: $r"
            case _ => ""
          }.mkString(" | "))
        case Some((kind, viaSql)) =>
          kind match {
            case "raw" => raw ::= name
            case "twin" => twin ::= name
            case _ => translated ::= name
          }
          if (!knownDifferent.contains(name) && viaDf != viaSql)
            mismatched ::= (name, kind)
      }
    }
    val compatible = raw.size + twin.size + translated.size
    info(s"oracle corpus: ${withOracle.size} — runs as written: ${raw.size}, " +
      s"via ansi twin: ${twin.size}, via DuckDialect: ${translated.size}, " +
      s"incompatible: ${incompatible.size}")
    incompatible.sortBy(_._1).foreach { case (n, r) =>
      info(s"  [duckdb-only] $n — ${r.take(200)}") }
    assert(mismatched.isEmpty,
      s"spark.sql(oracle) != DataFrame entry for: " +
        mismatched.sortBy(_._1).map { case (n, k) => s"$n($k)" }.mkString(", "))
    // the residual incompatible set is pinned by NAME: a new member is a
    // dialect regression reported as such; a disappearing member means
    // the snapshot (and this gate) should be tightened further
    val got = incompatible.map(_._1).toSet
    assert(got == expectedIncompatible,
      s"incompatible-set drift — new: ${(got -- expectedIncompatible).toSeq.sorted.mkString(", ")}; " +
        s"fixed (remove from snapshot): ${(expectedIncompatible -- got).toSeq.sorted.mkString(", ")}")
  }
}
