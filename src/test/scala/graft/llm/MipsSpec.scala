package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MIPS ≠ cosine: on unequal-norm corpora the two objectives rank
  * DIFFERENTLY, and mipsTopK must follow the inner product — a planted
  * case where the cosine-nearest vector (perfectly aligned, tiny norm)
  * loses to a longer, slightly rotated one. Also pins the zero-norm
  * corners the augmentation makes well-defined.
  */
class MipsSpec extends SparkSpec {

  import spark.implicits._

  test("ranks by dot, not cosine; zero-norm corpus ranks last; zero-norm query dropped") {
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),       // query
      (1L, Array(0.01f, 0.0f)),      // cosine 1.0 with q, dot tiny (10)
      (2L, Array(5.0f, 5.0f)),       // cosine .707, dot 5000 → MIPS winner
      (3L, Array(2.0f, 0.0f)),       // cosine 1.0, dot 2000 → second
      (4L, Array(0.0f, 0.0f)),       // zero norm: augmented-cosine defined, dot 0 → last
      (9L, Array(0.0f, 0.0f))        // zero-norm QUERY candidate: must be dropped
    ).toDF("vec_id", "embedding")

    val full = Similarity.mipsTopK(
      rows.filter(col("vec_id") === 0 || col("vec_id") === 9), rows, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dot"),
        col("_cos")).as[(Long, Long, Int, Long, Double)].collect()
    val out = full.map(r => (r._1, r._2, r._3, r._4))
    // the augmented-cosine column must agree with the exact-dot ranking
    // up to dot-ties: sorting by cosine yields a dot sequence that is
    // non-increasing (the reduction's monotonicity, observed on data)
    val cosOrderDots = full.sortBy(-_._5).map(_._4).toList
    assert(cosOrderDots == cosOrderDots.sorted(Ordering[Long].reverse),
      s"augmented cosine must rank like the dot outside ties: $cosOrderDots")

    assert(out.map(_._1).toSet === Set(0L), s"zero-norm query must be filtered: $out")
    val order = out.sortBy(_._3).map(r => (r._2, r._4)).toList
    // dots vs query (1000, 0): id1 = 10, id2 = 5000, id3 = 2000, id4 = 0, id9 = 0
    assert(order === List((2L, 5000000L), (3L, 2000000L), (1L, 10000L),
      (4L, 0L), (9L, 0L)),
      s"MIPS order must follow the inner product (cosine would put 1 or 3 first): $order")
  }

  test("indexed MIPS (e13) recall against the exact e12 baseline") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.mipsTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.mipsIvfTopK(queries, emb, k = 5,
      nlist = 16, nprobe = 6)
    // floor 0.8 under the measured value, the e3-vs-e1 margin
    // construction: Lloyd float means can wobble a near-tie list
    // boundary, but a drop below 0.8 at 50 exact pairs is a real
    // regression, not tie noise
    val recall = Similarity.recallAtK(approx, exact)
    info(f"indexed-MIPS recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"indexed MIPS recall $recall%.3f below 0.8")
    // every surviving query keeps exactly k candidates at nprobe=6 on
    // this corpus (probed lists hold far more than k members)
    assert(approx.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5))
  }

  test("indexed MIPS exactness boundary: full probe coverage == exact e12") {
    // with nprobe == nlist every list is probed — the candidate set is
    // the whole corpus and the ranking must be BIT-IDENTICAL to e12's
    // (same integer sort key, same tie-break): the approximation lives
    // only in list choice, nothing after it
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.mipsTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id", "rank", "dot")
    val full = Similarity.mipsIvfTopK(queries, emb, k = 5,
      nlist = 8, nprobe = 8)
    assert(full.exceptAll(exact).count() == 0 &&
      exact.exceptAll(full).count() == 0,
      "full-probe indexed MIPS must equal the exact e12 ranking")
  }
}
