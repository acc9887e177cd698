package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The injected optimizer rule: length-difference guards appear in the
  * optimized plan, never change results, and don't stack on re-runs.
  */
class LevenshteinPrefilterSpec extends SparkSpec {

  import spark.implicits._

  private lazy val pairs = Seq(
    ("kitten", "sitting"),   // lev 3, len diff 1
    ("abc", "abd"),          // lev 1
    ("a", "abcdefgh"),       // len diff 7 → guard rejects for k=2
    (null, "x"),
    ("same", "same")
  ).toDF("a", "b")

  // plan assertions need a non-local relation: over a LocalRelation the
  // optimizer pushes the (guarded) filter down and constant-folds the whole
  // thing away before the plan can be inspected
  private def customer = graft.Tables.t(spark, "/root/testdata/sf0.001", "customer")
  private def nation = graft.Tables.t(spark, "/root/testdata/sf0.001", "nation")

  test("guard appears in the optimized plan for filters and joins") {
    val filtered = customer
      .filter(expr("levenshtein(c_name, 'Customer#000000001') <= 2"))
    val planStr = filtered.queryExecution.optimizedPlan.toString
    assert(planStr.contains("abs(") && planStr.contains("length("),
      s"no length guard in:\n$planStr")

    val joined = customer.join(nation, expr("levenshtein(c_name, n_name) <= 5"))
    val joinPlan = joined.queryExecution.optimizedPlan.toString
    assert(joinPlan.contains("abs("), s"no guard in join plan:\n$joinPlan")
    // semantics: guard never removes a row the predicate would keep
    val k = 20
    val withRule = customer.join(nation, expr(s"levenshtein(c_name, n_name) <= $k")).count()
    val manual = customer.crossJoin(nation)
      .filter(expr(s"levenshtein(c_name, n_name, $k) <= $k")).count()
    assert(withRule == manual)
  }

  test("results identical to the unguarded predicate, nulls dropped") {
    val got = pairs.filter(expr("levenshtein(a, b) <= 2"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("abc", "same"))
    val strict = pairs.filter(expr("levenshtein(a, b) < 1"))
      .collect().map(_.getString(0)).toSet
    assert(strict == Set("same"))
  }

  test("idempotent: the guard is not duplicated in the final plan") {
    val planStr = customer
      .filter(expr("levenshtein(c_name, 'Customer#000000001') <= 2"))
      .queryExecution.optimizedPlan.toString
    val guards = "abs\\(".r.findAllIn(planStr).size
    assert(guards == 1, s"guard stacked $guards times:\n$planStr")
  }
}
