package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Substring-containment join via a token n-gram inverted index — the
  * scale path for "which corpus documents contain this phrase" (the
  * reference's uniqueness-gated containment match, dump.py-style J7).
  *
  * A broadcast nested loop is exact but O(probe × corpus × |text|); at
  * 100 TB the corpus side cannot be broadcast and the loop cannot be
  * sharded by any key. The index route exploits a structural fact of
  * character-level containment over space-delimited text: if `text`
  * contains the k-word phrase `w1 ⌴ w2 … ⌴ wk` as a substring, then the
  * INNER words w2…w(k-1) — each flanked by spaces inside the phrase —
  * must occur as complete, consecutive tokens of `text` (w1 may be a
  * suffix of the preceding token, wk a prefix of the following one).
  * So an inner-word n-gram is an exact candidate key:
  *
  *   candidates = phrases ⋈ distinct token-(k-2)-grams of corpus  (equi)
  *   matches    = candidates WHERE contains(text, phrase)     (residual)
  *
  * Shuffle discipline: the index rows are (doc, len, gram) — document
  * TEXT never rides the gram shuffle; the residual verify re-joins text
  * by id for candidate documents only (the d2/d3 verify pattern).
  * Candidate generation is a hash-partitionable equi join
  * (AQE-skew-splittable on hot grams); candidate count is bounded by
  * inner-gram frequency, not |corpus|². The index costs one explode over
  * corpus tokens per indexed length — at production scale the phrase
  * extractor is fixed-length, so exactly one length is built.
  *
  * Phrases with fewer than 3 words have no inner token and fall back to
  * a nested loop that broadcasts the SHORT-PHRASE side (assumed tiny —
  * it is the degenerate tail of the probe set); the corpus side stays
  * partitioned, so the fallback also survives an unbroadcastable corpus.
  *
  * Reference behavior: the unique-match gate of dump.py composes on top
  * of the returned pairs (see Relational j7/j7b).
  */
object PhraseIndexJoin {

  /** Index-route matches for probe phrases with ≥3 words. Exposed for the
    * plan-shape spec: this branch must contain no nested-loop join.
    */
  private[graft] def indexMatches(ph: DataFrame, c: DataFrame,
                                  innerLens: Seq[Int]): DataFrame = {
    val maxLen = innerLens.max
    val idxProbe = ph.filter(col("_k") >= 3)
      .withColumn("_len", least(col("_k") - 2, lit(maxLen)))
      .withColumn("_gram",
        array_join(slice(col("_pw"), lit(2), col("_len").cast("int")), " "))
    // an unmatched length would silently drop matches — make it loud
    val guarded = idxProbe.withColumn("_len",
      when(col("_len").isInCollection(innerLens), col("_len"))
        .otherwise(raise_error(concat(
          lit("PhraseIndexJoin: innerLens missing length "),
          col("_len").cast("string")))))
      .select("_pid", "_phrase", "_len", "_gram")

    // inverted index: distinct (doc, len, gram) — and nothing else; text
    // stays out of the exploded shuffle. The distinct matters for
    // correctness, not just size: a gram occurring twice in one doc would
    // duplicate the candidate pair and any downstream per-pair aggregate.
    // The token array is hoisted into its own column: split() inside the
    // transform lambda would re-split the text once per GRAM (no CSE
    // across lambda iterations) — O(|text|²) per document.
    val tokenized = c.withColumn("_toks", split(col("_text"), " "))
    val index = innerLens.map { len =>
      tokenized.select(col("_cid"),
          explode(transform(
            sequence(lit(0), greatest(size(col("_toks")) - len, lit(0))),
            i => array_join(slice(col("_toks"), i + 1, lit(len)), " "))).as("_gram"))
        .withColumn("_len", lit(len))
        .dropDuplicates("_cid", "_len", "_gram")
    }.reduce(_ unionByName _)

    // distinct (pid, cid) by construction: one (len, gram) per probe row ×
    // unique (cid, len, gram) index rows
    val candidates = guarded.join(index, Seq("_len", "_gram"))
      .select("_pid", "_phrase", "_cid")
    // residual verify: re-join text for candidate documents only
    candidates.join(c, Seq("_cid"))
      .filter(col("_text").contains(col("_phrase")))
      .select(col("_pid"), col("_cid"))
  }

  /** All (probeId, corpusId) pairs where `corpus.textCol` contains
    * `probe.phraseCol` as a substring. Exact (index candidates ⊇ true
    * matches; the residual filter is the definition itself).
    *
    * @param innerLens inner-gram lengths to index; must cover
    *                  `min(phraseWords − 2, max(innerLens))` for every
    *                  ≥3-word probe phrase (extra lengths cost index
    *                  size; a missing one raises at runtime rather than
    *                  dropping matches).
    */
  def containsJoin(probe: DataFrame, corpus: DataFrame,
                   probeIdCol: String, phraseCol: String,
                   corpusIdCol: String, textCol: String,
                   innerLens: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(innerLens.nonEmpty && innerLens.forall(_ >= 1),
      s"innerLens must be positive: $innerLens")
    require(probeIdCol != corpusIdCol,
      s"probeIdCol and corpusIdCol must differ (both '$probeIdCol'): the " +
        "output would carry two identically named columns")
    val ph = probe.select(col(probeIdCol).as("_pid"), col(phraseCol).as("_phrase"))
      .withColumn("_pw", split(col("_phrase"), " "))
      .withColumn("_k", size(col("_pw")))
    val c = corpus.select(col(corpusIdCol).as("_cid"), col(textCol).as("_text"))

    val viaIndex = indexMatches(ph, c, innerLens)

    // fallback: <3-word phrases via the exact loop, SHORT side broadcast
    val viaLoop = c.join(
        broadcast(ph.filter(col("_k") < 3).select("_pid", "_phrase")),
        col("_text").contains(col("_phrase")))
      .select(col("_pid"), col("_cid"))

    viaIndex.unionByName(viaLoop)
      .select(col("_pid").as(probeIdCol), col("_cid").as(corpusIdCol))
  }
}
