package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein ≤ 1) similarity self-join without a
  * cartesian product — the string-metric ER join the reference's fuzzy
  * name matcher approximates with blocking + per-pair scoring
  * (`match_names.py:97-130`), here with a GUARANTEED-complete candidate
  * scheme.
  *
  * Candidate generation is the symmetric-delete (FastSS / SymSpell)
  * construction: every string s emits itself plus its |s| single-char
  * deletion variants; two strings with ed(a,b) ≤ 1 ALWAYS share a
  * variant (substitution ⇒ a common deletion at the edited position;
  * insert/delete ⇒ the shorter string IS a deletion of the longer;
  * equality ⇒ the strings themselves), so recall is 1.0 by
  * construction, not probabilistically. A shared variant only bounds
  * ed ≤ 2 from above (delete different positions of "ab"/"ba" and meet
  * at "a"), so a banded-Levenshtein verify prunes the false positives —
  * `levenshtein(s1, s2, 1)`, the threshold overload, runs the O(k·n)
  * diagonal band instead of the full O(n²) table and codegens like any
  * built-in.
  *
  * Scale shape (100 TB): each row fans out to |s|+1 variant rows — for
  * ER-length strings (names, titles, SKUs) a ~20–40× map-side expansion
  * of a narrow (variant, id, string) projection, then ONE shuffle on the
  * variant. Bucket sizes are structurally bounded: a variant v is
  * reachable only from strings obtained by inserting one character into
  * v (≤ (|v|+1)·|Σ| strings, and in real corpora far fewer), so no
  * posting-list chunk guard is needed (contrast d2's shingle lists,
  * which are corpus-frequency-sized). Larger k is NOT offered: k-fold
  * deletion neighborhoods grow combinatorially (C(n,k)·fanout) and the
  * right scale path for k ≥ 2 is q-gram blocking + the same banded
  * verify (see `PhraseIndexJoin` for the indexed-substring machinery).
  */
object EditDistanceJoin {

  /** All (id1, id2, s1, s2) pairs with id1 < id2 and ed(s1, s2) ≤ 1. */
  def ed1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
    // self + one-char deletions; guard the empty string (sequence(0,-1)
    // would DESCEND, not produce an empty array)
    val dels = when(length(col("_s")) > 0,
      transform(sequence(lit(0), length(col("_s")) - 1),
        i => concat(col("_s").substr(lit(1), i),
          col("_s").substr(i + lit(2), length(col("_s"))))))
      .otherwise(array().cast("array<string>"))
    val variants = base.select(col("_id"), col("_s"),
      explode(array_union(array(col("_s")), dels)).as("_v"))
    val a = variants.select(col("_v"), col("_id").as("id1"), col("_s").as("s1"))
    val b = variants.select(col("_v"), col("_id").as("id2"), col("_s").as("s2"))
    a.join(b, "_v")
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "s1", "s2")
      .distinct() // dedupe BEFORE the verify: one band computation per pair
      .filter(levenshtein(col("s1"), col("s2"), 1) >= 0)
  }
}
