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
    // semantics: the guarded join keeps exactly the pairs a reference
    // edit-distance computed OUTSIDE Spark keeps (a 3-arg levenshtein
    // oracle would be tautological: it returns -1 above the threshold)
    val k = 1
    val c2 = customer.select(col("c_name").as("c2_name"))
    val withRule = customer.join(c2, expr(s"levenshtein(c_name, c2_name) <= $k")).count()
    val names = customer.select("c_name").collect().map(_.getString(0))
    val nnames = names
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val manual = (for (a <- names; b <- nnames if lev(a, b) <= k) yield 1).size
    assert(manual > 0 && manual < names.length.toLong * nnames.length,
      "oracle must be non-trivial (some pairs in, some out)")
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
