package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.functions.CondenseAgg
import graft.ops.Upsert
import graft.votes.{VoteCode, VoteMatrix}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import scala.collection.immutable.SortedSet

/** Property tests from SURVEY.md §5: codec bijection, condense∘explode
  * round-trip, upsert idempotence, and the pivot∘melt fixed point.
  * ScalaCheck drives pure properties; the Spark-backed ones sample fewer
  * cases (each case is a job).
  */
class PropertiesSpec extends SparkSpec {

  private def passes(p: Prop, n: Int = 100): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p).passed

  test("vote codec is a bijection on the enum domain") {
    assert(passes(Prop.forAll(Gen.oneOf(1, 2, 3, 4)) { v =>
      VoteCode.fromLetter(VoteCode.toLetter(v)) == v
    }))
    assert(passes(Prop.forAll(Gen.oneOf("Y", "N", "X", "E")) { l =>
      VoteCode.toLetter(VoteCode.fromLetter(l)) == l
    }))
  }

  test("condense renders exactly the runs of any int set (explode inverse)") {
    def explode(condensed: String): SortedSet[Long] =
      if (condensed.isEmpty) SortedSet.empty
      else SortedSet(condensed.split(", ").flatMap { part =>
        part.split("-") match {
          case Array(lo, hi) => lo.toLong to hi.toLong
          case Array(v) => Seq(v.toLong)
        }
      }.toIndexedSeq: _*)
    assert(passes(Prop.forAll(Gen.listOf(Gen.chooseNum(1900L, 2100L))) { ys =>
      val s = SortedSet(ys: _*)
      explode(CondenseAgg.finish(s)) == s
    }))
  }

  test("Islands.condense (SQL) equals CondenseAgg (UDAF) on random sets") {
    import spark.implicits._
    val data = Gen.listOfN(200,
        Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(2000L, 2030L)))
      .sample.get
    val df = data.toDF("k", "v")
    val sqlForm = graft.ops.Islands.condense(df, Seq("k"), "v", "c")
    val udafForm = df.as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(CondenseAgg.toColumn.name("c")).toDF("k", "c")
    assert(sqlForm.exceptAll(udafForm).count() === 0)
    assert(udafForm.exceptAll(sqlForm).count() === 0)
  }

  test("upsert is idempotent and key-complete") {
    import spark.implicits._
    val existing = (1 to 100).map(i => (i.toLong, s"old$i")).toDF("k", "v")
    val updates = (50 to 150).map(i => (i.toLong, s"new$i")).toDF("k", "v")
    val once = Upsert(existing, updates, Seq("k"))
    val twice = Upsert(once, updates, Seq("k"))
    assert(once.exceptAll(twice).count() === 0)
    assert(twice.exceptAll(once).count() === 0)
    assert(once.count() === 150)
    // updates win on overlap
    assert(once.filter(col("k") === 75 && col("v") === "new75").count() === 1)
  }

  test("pivot is a fixed point of melt∘pivot on generated matrices") {
    val letterGen = Gen.oneOf("Y", "N", "X", "E", "")
    val cases = Gen.listOfN(3, Gen.zip(
      Gen.chooseNum(2, 6),                       // rolls
      Gen.chooseNum(2, 5),                       // members
      Gen.oneOf(true, false))).sample.get        // districts present?
    for (((nRolls, nMembers, withDistricts), ci) <- cases.zipWithIndex) {
      val rows = for {
        r <- 0 until nRolls
        m <- 0 until nMembers
      } yield Row(2020, 1, r, s"ROLL $r", r + 1, s"2020-01-0${r % 9 + 1} 11:00:00",
        m, s"Member M$m",
        if (withDistricts) (m + 1).toString else null,
        if (withDistricts) (if (m % 2 == 0) "Democrat" else "Republican") else null,
        letterGen.sample.get match { case "" => null; case l => l })
      val long = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), VoteMatrix.longSchema)
      val bytes = VoteMatrix.toCsvBytes(long)
      val f = Files.createTempFile(s"prop_pivot_$ci", ".csv")
      Files.write(f, bytes)
      val remelted = VoteMatrix.melt(spark, f.toString, 2020, 1)
      val bytes2 = VoteMatrix.toCsvBytes(remelted)
      assert(new String(bytes2, StandardCharsets.UTF_8) ===
        new String(bytes, StandardCharsets.UTF_8), s"case $ci not a fixed point")
    }
  }

  test("sketch aggregates stay within error bounds of the exact aggregates") {
    val dir = "/root/testdata/sf0.01"
    val ev = Tables.t(spark, dir, "events")
    val approx = SparkEntry.queries("a15_approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (u, p50)) <- exact) {
      val (au, ap50) = approx(k)
      // HLL++ default rsd is 5%; 3σ-ish slack
      assert(math.abs(au - u) <= math.max(3, 0.15 * u),
        s"$k: approx_users $au vs exact $u")
      // percentile_approx at accuracy 10000 on ~20k rows/group: tight
      val spread = ev.filter(col("event_type") === k)
        .agg(expr("percentile(value, 0.55)") - expr("percentile(value, 0.45)"))
        .head().getDouble(0)
      assert(math.abs(ap50 - p50) <= math.max(1e-6, spread),
        s"$k: p50 $ap50 vs exact $p50")
    }
  }
}
