package graft.ops

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("classifies insert / update / delete and drops unchanged rows") {
    val oldDf = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "s", "n")
    val newDf = Seq((2L, "b", 20), (3L, "C", 30), (4L, "d", 40))
      .toDF("k", "s", "n")
    val d = SnapshotDiff.diff(oldDf, newDf, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "D", 3L -> "U", 4L -> "I"))  // 2 unchanged: absent
  }

  test("null values compare null-safely (null → value is U, null → null is not)") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val newDf = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    val d = SnapshotDiff.diff(oldDf, newDf, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "U"))
  }

  test("multi-column keys and old_/new_ value columns round out the change set") {
    val oldDf = Seq((1L, "x", 10), (1L, "y", 11)).toDF("k1", "k2", "n")
    val newDf = Seq((1L, "x", 99), (1L, "z", 12)).toDF("k1", "k2", "n")
    val rows = SnapshotDiff.diff(oldDf, newDf, Seq("k1", "k2"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    //            (k2, op)
    assert(rows === Set(("x", "U"), ("y", "D"), ("z", "I")))
  }

  test("mismatched snapshot schemas are rejected") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(Seq((1L, "a")).toDF("k", "s"),
        Seq((1L, 2L)).toDF("k", "n"), Seq("k"))
    }
  }
}
