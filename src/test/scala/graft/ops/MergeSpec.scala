package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-action MERGE kernel: update / delete / insert / keep in one
  * pass, delete-of-absent-key as a no-op, and — the subtle one — NULL
  * payload values never masquerade as "row absent" (presence is marker
  * literals, not payload nulls).
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  test("all four action paths + absent-key delete no-op + NULL payloads") {
    val target = Seq(
      (1L, Some("a")),  // will update (to NULL payload!)
      (2L, Some("b")),  // will delete
      (3L, None),       // untouched: NULL payload must stay a 'keep' row
      (4L, Some("d"))   // untouched
    ).toDF("k", "v")
    val source = Seq(
      (1L, None: Option[String]),   // matched update setting v = NULL
      (2L, Some("DEL")),            // matched delete
      (9L, Some("DEL")),            // delete of absent key: no-op
      (5L, Some("e"))               // unmatched insert
    ).toDF("k", "v")

    val out = Merge(target, source, Seq("k"),
      deleteWhen = col("v") === "DEL")
      .as[(Long, Option[String], String)].collect().toSet

    assert(out === Set(
      (1L, None, "update"),   // NULL new image applied, still 'update'
      (3L, None, "keep"),     // NULL existing payload kept, not dropped
      (4L, Some("d"), "keep"),
      (5L, Some("e"), "insert")
    ), s"got $out")
  }

  test("duplicate source rows for one key raise, never silently multiply") {
    val t0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s0 = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    val e = intercept[Exception] {
      Merge(t0, s0, Seq("k"), deleteWhen = lit(false)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("multiple source rows")),
      s"expected the MERGE ambiguity guard, got: ${messages(e).mkString(" | ")}")
  }

  test("schema mismatch fails loudly") {
    val t0 = Seq((1L, "a")).toDF("k", "v")
    val s0 = Seq((1L, "a", 2L)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      Merge(t0, s0, Seq("k"), deleteWhen = lit(false))
    }
  }
}
