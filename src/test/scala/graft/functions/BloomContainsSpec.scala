package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import graft.Tables
import org.apache.spark.sql.functions._

/** The native Bloom probe: registration, exact membership semantics (no
  * false negatives), null propagation, parity with the UDF fallback via
  * [[Dedup.contaminationBloom]], and — the reason it exists — no UDF node
  * in the probe plan.
  */
class BloomContainsSpec extends SparkSpec {

  import spark.implicits._

  private def serializedBloom(values: Seq[Long], fpp: Double): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(values.size.toLong, fpp)
    values.foreach(bf.putLong)
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }

  test("graft_bloom_contains is registered by the extensions") {
    assert(spark.catalog.functionExists("graft_bloom_contains"))
  }

  test("no false negatives; null hash propagates null") {
    val members = (1L to 1000L).map(_ * 7919L)
    val bytes = serializedBloom(members, fpp = 0.01)
    val probed = members.map(Option(_)).appended(None).toDF("h")
      .select(col("h"),
        call_function("graft_bloom_contains", lit(bytes), col("h")).as("hit"))
      .collect()
    val hits = probed.filter(_.get(0) != null)
    assert(hits.forall(_.getBoolean(1)), "a member must never be rejected")
    val nullRow = probed.find(_.get(0) == null).get
    assert(nullRow.get(1) == null, "null hash must yield null, not false")
  }

  test("null FILTER literal yields null rows, not a planning crash") {
    // the codegen path forces the filter lazy val at plan compilation;
    // a null (foldable, binary-typed) literal must emit always-null code
    // per the doc contract instead of NPE-ing in doGenCode
    val out = Seq(1L, 2L).toDF("h")
      .select(call_function("graft_bloom_contains",
        lit(null).cast("binary"), col("h")).as("hit"))
      .collect()
    assert(out.length == 2 && out.forall(_.get(0) == null))
  }

  test("non-member rejection rate is near the configured fpp") {
    val members = (1L to 2000L).map(_ * 7919L)
    val bytes = serializedBloom(members, fpp = 0.01)
    val nonMembers = (1L to 2000L).map(_ * 7919L + 1)
    val falsePos = nonMembers.toDF("h")
      .select(call_function("graft_bloom_contains", lit(bytes), col("h")).as("hit"))
      .filter(col("hit")).count()
    assert(falsePos < 200, s"fpp wildly off: $falsePos/2000 false positives")
  }

  test("contaminationBloom plans the native probe — no UDF node") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.where(col("doc_id") % 25 === 0)
    val train = docs.where(col("doc_id") % 25 =!= 0)
    val out = Dedup.contaminationBloom(train, bench, n = 3, minOverlap = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      "probe must run through the native expression on an extended session")
    assert(!plan.contains("UDF("), s"no Scala UDF node expected in:\n$plan")
  }

  test("native probe result is bit-identical to the exact contamination join") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.where(col("doc_id") % 25 === 0)
    val train = docs.where(col("doc_id") % 25 =!= 0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    val exact = toMap(Dedup.contamination(train, bench, n = 3, minOverlap = 2))
    val bloom = toMap(Dedup.contaminationBloom(train, bench, n = 3,
      minOverlap = 2, fpp = 0.2))
    assert(exact.nonEmpty)
    assert(bloom === exact)
  }
}
