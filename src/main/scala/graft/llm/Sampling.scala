package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for data mixing: every sampling decision is a
  * pure function of the row id, so a sample is reproducible across runs,
  * engines and partitionings — no RNG state, no seed plumbing, and an
  * external oracle can verify the exact membership.
  */
object Sampling {

  /** 31-bit LCG step of the id — the portable stand-in for a hash that
    * both Spark and a SQL oracle evaluate identically with plain integer
    * arithmetic. The id is reduced mod 2^31 BEFORE the multiply so the
    * product stays ≤ ~2.4e18 < Long.MaxValue for ANY 64-bit id (the raw
    * `id * a` form overflows — an ANSI ARITHMETIC_OVERFLOW — above
    * ~8.4e9). Ids are expected non-negative; for negative ids Spark's
    * pmod and a SQL oracle's `%` disagree on sign, so membership would
    * diverge from the oracle (pmod keeps the Spark side well-defined).
    */
  def detHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(1103515245L) + lit(12345L),
      lit(2147483648L))

  /** Bernoulli-style sample: keep ids whose hash falls in the lowest
    * `rate` fraction of the hash space. Map-only — no shuffle at all.
    */
  def hashSample(df: DataFrame, rate: Double, idCol: String = "doc_id"): DataFrame =
    df.where(detHash(col(idCol)) < lit((rate * 2147483648.0).toLong))

  /** The ONE deterministic walk order every stratified op shares (and the
    * contract the DuckDB oracles' `hh` formula mirrors): per stratum, by
    * (detHash(id), id). Centralized so its consumers cannot drift.
    */
  private def hashOrder(strataCol: String, idCol: String) =
    Window.partitionBy(strataCol).orderBy(detHash(col(idCol)), col(idCol))

  /** Exactly min(k, |stratum|) rows per stratum, chosen by hash order —
    * deterministic reservoir-style stratified sampling. One shuffle on the
    * stratum key; skewed strata cost what their size costs (the window is
    * a per-group top-k, which Spark runs as a partial sort).
    */
  def stratified(df: DataFrame, strataCol: String, k: Int,
                 idCol: String = "doc_id"): DataFrame = {
    require(!df.columns.contains("_rn"),
      "column name _rn is reserved by Sampling.stratified")
    df.withColumn("_rn", row_number().over(hashOrder(strataCol, idCol)))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Data mixing under a per-stratum TOKEN budget: walk each stratum in
    * deterministic hash order and keep documents while the running token
    * total stays within `budget` — the "take ~N tokens per source" step of
    * corpus assembly. A document that straddles the boundary is kept
    * (budgets are soft); everything after it is dropped. Same single
    * shuffle as [[stratified]].
    */
  def tokenBudget(df: DataFrame, strataCol: String, tokensCol: String,
                  budget: Long, idCol: String = "doc_id"): DataFrame = {
    require(!df.columns.contains("_cum"),
      "column name _cum is reserved by Sampling.tokenBudget")
    val w = hashOrder(strataCol, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol)).over(w))
      .where(col("_cum") - col(tokensCol) < budget)
      .drop("_cum")
  }

  /** Temperature-style domain-mixture sampling — the corpus-reweighting
    * step of multilingual / multi-source training-data assembly: stratum
    * `d` (a language, a source) gets a document quota proportional to
    * `weightFn(n_d)` (default `sqrt`, the α=0.5 temperature that
    * upsamples rare domains relative to proportional sampling), capped at
    * its size, and fills the quota in the shared deterministic hash
    * order.
    *
    * Everything after the per-stratum count is integer-exact so an
    * external oracle reproduces membership bit-for-bit: weights are
    * quantized to micro-units via `floor(w * 1e6)` (IEEE requires `sqrt`
    * and multiply to be correctly rounded, so both engines quantize
    * identically), the normalizer is an integer sum (order-independent),
    * and quotas use integer `div`. Overflow-safe while
    * `budget * max(weightFn(n_d)) * 1e6 < 2^63` — with the sqrt default,
    * `budget * sqrt(max stratum) < 9.2e12`, ample for any real sample.
    *
    * Cost: one count shuffle over the tiny strata dim, one broadcast
    * quota join, and the same single stratum-key window shuffle as
    * [[stratified]]. A null stratum is a stratum like any other (it is
    * counted, weighted, and joined null-safely — an equi-join would count
    * it into the normalizer and then silently drop its rows).
    */
  def mixtureSample(df: DataFrame, strataCol: String, budget: Long,
                    weightFn: Column => Column = sqrt,
                    idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    Seq("_rn", "quota", "_qkey").foreach(c => require(!df.columns.contains(c),
      s"column name $c is reserved by Sampling.mixtureSample"))
    val weighted = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_nd"))
      .withColumn("_wdq",
        floor(weightFn(col("_nd").cast("double")) * lit(1e6)).cast("long"))
    val quotas = weighted
      .crossJoin(broadcast(weighted.agg(sum(col("_wdq")).as("_S"))))
      .withColumn("quota",
        least(col("_nd"), expr(s"(_wdq * ${budget}L) div _S")))
      .select(col(strataCol).as("_qkey"), col("quota"))
    df.withColumn("_rn", row_number().over(hashOrder(strataCol, idCol)))
      .join(broadcast(quotas), col(strataCol) <=> col("_qkey"))
      .where(col("_rn") <= col("quota"))
      .select(col(idCol), col(strataCol), col("quota"))
  }

  /** Weighted sampling without replacement (x26) — pick `k` documents
    * with inclusion probability proportional to an integer weight (here:
    * word count, so sampling is token-budget-proportional, the mixture
    * shape "sample by content volume, not by document count").
    *
    * This is the A-ES scheme in its EXACT integer form: A-ES ranks items
    * by u^(1/w) (u uniform), and u^(1/w) is distributed as the MAX of w
    * independent uniforms — so each document draws its w per-unit hashes
    * and keeps the max as its sort key. No `pow`/`ln` ever runs: libm
    * rounding differs across engines, while the max-of-hashes form is
    * pure integer arithmetic an oracle replays bit-for-bit ([[detHash]]
    * of `doc_id * 1000003 + i`, collision-free on this corpus's id
    * range). The expansion is per-row `transform` over `sequence(1, w)`
    * — array math inside the row, no explode, no shuffle.
    *
    * Scale shape: the global top-k runs as orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps, never a
    * single-partition window over the corpus); the rank column is
    * written by a window over the k SURVIVORS only.
    */
  def weightedSampleAes(df: DataFrame, k: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val nWords = size(split(col(textCol), " ")).cast("long")
    val key = array_max(transform(
      sequence(lit(1L), col("n_words")),
      i => detHash(col(idCol) * lit(1000003L) + i)))
    df.select(col(idCol), nWords.as("n_words"))
      .withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
      .withColumn("rnk",
        row_number().over(
          Window.orderBy(col("sample_key").desc, col(idCol))).cast("long"))
  }

  /** Training-sequence packing — the concat-and-chop step that turns a
    * corpus into fixed-`seqLen`-token LM training sequences: documents are
    * laid out in deterministic hash order and the token stream is chopped
    * every `seqLen` tokens, so a document occupies sequences
    * [start_seq, end_seq] starting at `offset` tokens into start_seq
    * (documents straddle boundaries, the standard pre-training layout —
    * no padding, every sequence except the stratum's last is exactly
    * full).
    *
    * Packing is per `strataCol` so the running-total window stays
    * partitioned: one shuffle on the stratum key, never a global
    * single-partition sort. At corpus scale, strata are sources or
    * hash-buckets (any deterministic partition of the corpus packs
    * independently by construction).
    *
    * Rows with a non-positive token count are dropped before the layout:
    * a zero-token document occupies no tokens (its span would be the
    * inverted `[start, start-1]`), and a negative count would corrupt the
    * running total — and therefore the layout — of every later document
    * in its stratum.
    */
  def packSequences(df: DataFrame, strataCol: String, tokensCol: String,
                    seqLen: Long, idCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val reserved = Set("_cum", "start_seq", "end_seq", "offset")
    val clash = Seq(idCol, strataCol, tokensCol).filter(reserved.contains)
    require(clash.isEmpty,
      s"input column name(s) collide with packSequences output: ${clash.mkString(",")}")
    val w = hashOrder(strataCol, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(tokensCol) > 0)
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .select(col(idCol), col(strataCol), col(tokensCol),
        floor((col("_cum") - col(tokensCol)) / seqLen).as("start_seq"),
        floor((col("_cum") - 1) / seqLen).as("end_seq"),
        ((col("_cum") - col(tokensCol)) % seqLen).as("offset"))
  }
}
