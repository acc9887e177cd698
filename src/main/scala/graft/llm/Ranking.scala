package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword-relevance ranking over the document corpus — the lexical leg
  * of a retrieval / curation pipeline (select training documents relevant
  * to a topic, mine hard negatives, build eval slices).
  *
  * Reference scope: the reference engine has no ranking operator; this is
  * part of the beyond-reference training-data surface (SURVEY §2 x-ops),
  * built on the same whitespace tokenization as x3/x9.
  */
object Ranking {

  /** BM25 relevance of each document to a bag of query `terms` —
    * the Robertson idf (`ln(1 + (N − df + 0.5)/(df + 0.5))`, always
    * positive, the Lucene-default formulation) with the standard
    * (k1, b) length-normalized term-frequency weight.
    *
    * Only documents containing ≥1 query term are returned (inverted-index
    * semantics — on a real index the scan IS the posting lists; here the
    * `isin` filter drops non-matching tokens map-side so the only corpus
    * shuffle carries matched tokens, bounded by |terms| × docs, not
    * corpus token count). Corpus stats (N, avgdl) are a 1-row broadcast;
    * the per-term idf table is |terms| rows, broadcast into the scoring
    * join.
    *
    * Cross-engine determinism (the oracle hash-matches): idf and the
    * per-term weight are quantized to integer MICRO-UNITS on both
    * engines, and the per-document score is the integer SUM of micro
    * weights — no float accumulation order anywhere. Inside one weight,
    * every op except `ln` is IEEE-correctly-rounded with an identical
    * expression tree, so the doubles are bit-identical; `ln` (not
    * required correctly-rounded) is evaluated once per TERM, then pinned
    * by the micro-quantization before it touches any per-document value.
    *
    * Output: (idCol, terms_matched, score_micro = Σ round(w · 1e6)).
    */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // one corpus pass for N and avgdl; both exact (integer sum / count is
    // a correctly-rounded division of exact integers)
    val stats = broadcast(
      docs.select(size(TextStats.words(col(textCol))).as("_dl0"))
        .agg(count(lit(1)).cast("double").as("_n"), avg(col("_dl0")).as("_avgdl")))
    val toks = docs
      .select(col(idCol), TextStats.words(col(textCol)).as("_ws"))
      .select(col(idCol), size(col("_ws")).cast("double").as("_dl"),
        explode(col("_ws")).as("_tok"))
      .filter(col("_tok").isin(terms: _*))
    // _dl in the grouping key (functionally dependent on the id) instead
    // of a first() aggregate — no order-sensitive agg anywhere
    val tf = toks.groupBy(col(idCol), col("_tok"), col("_dl"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dft = tf.groupBy("_tok").agg(count(lit(1)).cast("double").as("_df"))
    val idf = dft.crossJoin(stats)
      .withColumn("_idfm",
        round(log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)) * 1e6))
      .select("_tok", "_idfm", "_avgdl")
    // the weight's expression tree mirrors the oracle SQL token-for-token
    // (left-assoc chains) so every intermediate double is bit-identical
    val w = tf.join(broadcast(idf), "_tok")
      .withColumn("_wm",
        round(col("_idfm") / 1e6 * (col("_tf") * lit(k1 + 1)) /
          (col("_tf") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl")))
          * 1e6).cast("long"))
    w.groupBy(col(idCol))
      .agg(count(lit(1)).as("terms_matched"), sum(col("_wm")).as("score_micro"))
  }

  /** Hybrid lexical + vector retrieval with reciprocal-rank fusion
    * (Cormack, Clarke, Büttcher, SIGIR 2009): the BM25 leg ranks
    * documents for the query `terms`, the semantic leg ranks them by
    * exact quantized cosine against the `queryVecId` embedding, each leg
    * keeps its top `nLeg`, and fusion scores
    * `Σ_legs 1/(kRrf + rank)` (a document absent from a leg contributes
    * 0). Output: top `k` by (rrf desc, id).
    *
    * Scale shape: each leg ends in a TakeOrderedAndProject top-nLeg (no
    * global single-partition sort — the `Window.orderBy` rank runs AFTER
    * the limit, over nLeg rows); the fusion join and final top-k touch
    * 2 × nLeg rows. For a query BATCH, partition every window and
    * top-k by query id — this single-query form is the interactive
    * retrieval shape.
    *
    * Determinism: ranks are integers off total orders (both legs
    * tie-break on id; BM25 scores are integer micro-units and cosine is
    * exact on quantized vectors), and the RRF sum is a fixed-order chain
    * of correctly-rounded double ops — the oracle hash-matches on
    * `round(rrf · 1e9)`.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
                queryVecId: Long, k: Int, nLeg: Int = 100, kRrf: Int = 60,
                idCol: String = "doc_id", textCol: String = "text",
                vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lexTop = bm25(docs, terms, idCol = idCol, textCol = textCol)
      .orderBy(col("score_micro").desc, col(idCol)).limit(nLeg)
      .withColumn("_rl",
        row_number().over(Window.orderBy(col("score_micro").desc, col(idCol))))
      .select(col(idCol).as("_id"), col("_rl"))
    // null/zero-norm exclusion on BOTH sides: a zero-norm vector's cosine
    // is NaN, which Spark sorts ABOVE every real score — it would seize
    // the top semantic ranks. And a missing (or degenerate) query vector
    // must fail loudly, not silently degrade to lexical-only results.
    val qv0 = embeddings.filter(col(vecIdCol) === queryVecId && col(vecCol).isNotNull)
      .select(Similarity.quantized(col(vecCol)).as("_qv"))
      .filter(Similarity.dot(col("_qv"), col("_qv")) > 0)
    require(qv0.count() == 1,
      s"queryVecId=$queryVecId must match exactly one non-degenerate embedding")
    val qv = broadcast(qv0)
    val semTop = embeddings.filter(col(vecCol).isNotNull)
      .select(col(vecIdCol).as("_id"), Similarity.quantized(col(vecCol)).as("_cv"))
      .filter(Similarity.dot(col("_cv"), col("_cv")) > 0)
      .crossJoin(qv)
      .withColumn("_cos", Similarity.cosine(col("_cv"), col("_qv")))
      .orderBy(col("_cos").desc, col("_id")).limit(nLeg)
      .withColumn("_rs", row_number().over(Window.orderBy(col("_cos").desc, col("_id"))))
      .select(col("_id"), col("_rs"))
    val fused = lexTop.join(semTop, Seq("_id"), "full_outer")
      .withColumn("_rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("_rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("_rs")), lit(0.0)))
    fused.orderBy(col("_rrf").desc, col("_id")).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("_rrf").desc, col("_id"))))
      .select(col("_id").as(idCol), col("rank"),
        round(col("_rrf") * 1e9).cast("long").as("rrf_nano"))
  }
}
