package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** j22's contract: the runtime bloom filter actually injects on the
  * tuned session (and changes nothing about results), and the decline
  * conditions the entry exists to guard — default size gates, broadcast
  * plans — really do veto the rule silently.
  */
class BloomJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sides(ss: org.apache.spark.sql.SparkSession) = {
    val fact = graft.Tables.t(ss, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val dim = graft.Tables.t(ss, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("l_orderkey"))
    (fact, dim)
  }

  test("bloom filter injects on the tuned session and preserves the join result") {
    val ss = BloomJoin.bloomSession(spark)
    val (fact, dim) = sides(ss)
    val joined = BloomJoin.requireInjected(
      BloomJoin.bloomFiltered(fact, dim, "l_orderkey"))
    // semantics: identical to the plain (broadcast) join, row for row
    val got = joined.groupBy("l_orderkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = fact.join(dim, Seq("l_orderkey")).groupBy("l_orderkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "degenerate corpus: the selective filter matched nothing")
  }

  test("the rule declines SILENTLY at production defaults on a small corpus") {
    // this is the hazard j22's requireInjected exists for: everything
    // looks right (flag on, selective filter, shuffle join) but the
    // 10 GB application-side gate quietly vetoes
    val ss = spark.newSession()
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val (fact, dim) = sides(ss)
    val plan = BloomJoin.bloomFiltered(fact, dim, "l_orderkey")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("might_contain"),
      "expected the default size gate to veto injection at toy scale")
    intercept[IllegalArgumentException] {
      BloomJoin.requireInjected(BloomJoin.bloomFiltered(fact, dim, "l_orderkey"))
    }
  }

  test("a broadcastable-by-size join declines (no shuffle for the bloom to save)") {
    // even with the size gates open, a dim small enough to broadcast
    // vetoes injection — restore the default broadcast threshold the
    // tuned session disables and watch the rule decline again
    val ss = BloomJoin.bloomSession(spark)
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val (fact, dim) = sides(ss)
    val plan = BloomJoin.bloomFiltered(fact, dim, "l_orderkey")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("might_contain"),
      "broadcastable join must not carry a runtime bloom filter")
  }
}
