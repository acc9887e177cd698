package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fact = (1L to 1000L)
    .map(i => (i, i % 3, s"p$i")).toDF("id", "k", "payload")
  private lazy val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"))
    .toDF("k", "name")

  test("salted join equals the plain join") {
    val plain = fact.join(dim, "k")
      .select("k", "id", "payload", "name")
    val salted = SkewJoin.salted(fact, dim, "k", salt = 8)
      .select("k", "id", "payload", "name")
    assert(salted.count() === 1000)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("join runs on (key, salt), spreading each hot key") {
    val salted = SkewJoin.salted(fact, dim, "k", salt = 8)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan.take(600))
    // salt values actually spread: every (key, salt) bucket is < the full
    // hot-key row count
    val spread = fact.withColumn("_salt",
        pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
      .groupBy("k", "_salt").count()
    assert(spread.count() === 24)              // 3 keys × 8 salts all hit
    assert(spread.agg(max("count")).head.getLong(0) < 334)
  }

  test("salting is deterministic across runs (same rows, same salts)") {
    val a = fact.withColumn("_s", pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
    val b = fact.repartition(13)
      .withColumn("_s", pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("explicit saltOn subset gives the same join, skipping payload hashing") {
    val narrow = SkewJoin.salted(fact, dim, "k", salt = 8, saltOn = Seq("id"))
      .select("k", "id", "payload", "name")
    val plain = fact.join(dim, "k").select("k", "id", "payload", "name")
    assert(narrow.exceptAll(plain).isEmpty && plain.exceptAll(narrow).isEmpty)
    intercept[IllegalArgumentException] {
      SkewJoin.salted(fact, dim, "k", 8, saltOn = Seq("nope"))
    }
  }

  test("reserved column name is rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.salted(fact.withColumnRenamed("payload", "_salt"), dim, "k", 4)
    }
  }

  test("AQE twin equals the plain join AND the skew split actually fires") {
    // hot corpus: 200k rows on 3 keys with a fat payload so partition
    // bytes clear the (test-scaled) skew threshold
    val ss = SkewJoin.aqeSession(spark)
    import ss.implicits._
    val bigFact = ss.range(200000)
      .select(col("id"), (col("id") % 3).as("k"),
        concat(lit("x"), col("id").cast("string"),
          lit("y" * 64)).as("payload"))
    val smallDim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")
    val joined = SkewJoin.aqeSkewed(bigFact, smallDim, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("id").as("s"))
    val got = joined.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val exp = bigFact.join(smallDim, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === exp)
    // after execution the adaptive plan is final: the SMJ must be marked
    // as a skew join (OptimizeSkewedJoin fired and split partitions)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected OptimizeSkewedJoin to fire; plan:\n${plan.take(2000)}")
  }
}
