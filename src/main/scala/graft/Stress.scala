package graft

import graft.llm.{Components, Dedup}
import org.apache.spark.sql.functions._

/** Scale-simulation harness: compose the end-to-end dedup chain
  * (normalize → MinHash-LSH candidates → connected components → survivor
  * selection) over an N×-replicated corpus and print per-stage rows +
  * wall time. Not a benchmark (Bench is) and not a test (the suite is) —
  * this is the "would the composed pipeline still behave at 10× the
  * bench corpus" probe: replicas of a document are near-dups of the
  * original by construction (a deterministic word appended keeps them
  * off exact-dup fast paths), so cluster count and survivor count have
  * known expectations that are asserted, not eyeballed.
  *
  * Usage: runMain graft.Stress [replicas] [sfDir]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    require(replicas >= 1, s"replicas must be >= 1: $replicas")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def stage[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val base = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").repartition(32)
    val nBase = base.count()
    // id stride comes from the data (max id + 1), not a constant — a
    // hardcoded offset silently collides with base ids at larger scale
    // factors and corrupts every id-keyed step downstream
    val stride = base.agg(max("doc_id")).head.getLong(0) + 1
    // replica k of doc d: id d + k·stride, text + one marker word — a
    // near-dup (jaccard just under 1), never an exact dup
    val corpus = (0 until replicas).map { k =>
      if (k == 0) base
      else base.select((col("doc_id") + k * stride).as("doc_id"),
        concat(col("text"), lit(s" replica$k")).as("text"))
    }.reduce(_ unionByName _)
    println(s"[stress] corpus: $nBase docs x $replicas replicas")

    val normalized = corpus.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("text"))

    val pairs = stage("minhash-lsh pairs") {
      val p = Dedup.minhashLshPairs(normalized, n = 3, numHashes = 64,
        bands = 16, threshold = 0.5).select("id1", "id2")
        .localCheckpoint(true)
      println(s"[stress]   pairs: ${p.count()}")
      p
    }
    val labels = stage("connected components") {
      val l = Components.connectedComponents(pairs).localCheckpoint(true)
      println(s"[stress]   labeled nodes: ${l.count()}")
      l
    }
    val survivors = stage("survivor selection") {
      val removed = labels.where(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      val s = corpus.join(removed, Seq("doc_id"), "left_anti")
      val n = s.count()
      println(s"[stress]   surviving docs: $n")
      n
    }

    // Every replica group should collapse toward one survivor: an upper
    // bound (with LSH recall slack) catches under-merging, and a lower
    // bound catches catastrophic over-merge — a degenerate bucketing that
    // collapses everything into one cluster must fail, not print OK.
    // (Base docs may legitimately near-dup each other; half is safe
    // slack — observed ~95% of base survives.)
    val expectedMax = (nBase * (1 + 0.1 * (replicas - 1))).toLong
    val expectedMin = nBase / 2
    require(survivors <= expectedMax,
      s"under-merged: $survivors survivors > $expectedMax allowed " +
        s"(recall collapse at $replicas x scale)")
    require(survivors >= expectedMin,
      s"over-merged: $survivors survivors < $expectedMin — distinct " +
        "documents are being collapsed together")
    println(s"[stress] OK: $survivors survivors from ${nBase * replicas} docs " +
      s"(expected in [$expectedMin, $expectedMax])")

    // ---- d14/d14b span dedup under volume (r6 verdict #8) -------------
    // The LSH corpus above is the WRONG input for a per-replica identity
    // assertion: its " replica$k" markers are asymmetric. Replica 0 is
    // unmarked, so boundary-crossing grams that stop inside the shared
    // " replica" prefix are flagged (present in every marked copy) for
    // replicas ≥ 1 but have no counterpart in replica 0 — and past 10
    // replicas the digits themselves share prefixes (" replica1" is a
    // prefix of " replica10"), so single- and double-digit replicas flag
    // different boundary grams. A dedicated span corpus fixes both:
    // EVERY replica (0 included) gets an equal-length 3-char marker
    // " \u0001X" sharing only the " \u0001" prefix, with a unique final
    // char per replica. \u0001 never occurs in document text (asserted),
    // so a gram containing it can only match other marker-crossing
    // grams. Then for any gram of replica r's copy of doc d:
    //   · grams ending at or before the shared-prefix end are byte-equal
    //     across ALL replicas of d → distinct-doc count ≥ replicas ≥ 2,
    //     flagged everywhere;
    //   · grams containing the unique final char exist only inside
    //     replica r, and their distinct-doc count is the number of base
    //     docs sharing the preceding 19-char tail — the same number in
    //     every replica.
    // Flagged positions are therefore replica-invariant BY CONSTRUCTION,
    // independent of base-doc suffix sharing (the r7-advice data
    // dependence). Two assertions, per-copy identity not eyeball:
    //   (a) the hashed twin (16-byte keys on the wire) equals the exact
    //       text form row-for-row at volume;
    //   (b) each replica's span set, ids shifted back, is identical to
    //       replica 0's (one xor fingerprint per replica).
    stage("span dedup at volume") {
      require(replicas >= 2 && replicas <= 58,
        s"span stage needs 2..58 replicas (unique printable marker chars): $replicas")
      require(base.where(col("text").contains("\u0001")).limit(1).count() == 0,
        "document text contains \\u0001 — span-stage marker uniqueness is void")
      val spanCorpus = (0 until replicas).map { k =>
        base.select((col("doc_id") + k * stride).as("doc_id"),
          concat(col("text"), lit(s" \u0001${('A' + k).toChar}")).as("text"))
      }.reduce(_ unionByName _)
      val spansHashed = Dedup.duplicateSpansHashed(spanCorpus, k = 20, minDocs = 2)
        .localCheckpoint(true)
      val nSpans = spansHashed.count()
      println(s"[stress]   spans (hashed twin): $nSpans")
      val spansText = Dedup.duplicateSpans(spanCorpus, k = 20, minDocs = 2)
      require(spansHashed.exceptAll(spansText).count() == 0 &&
        spansText.exceptAll(spansHashed).count() == 0,
        "d14b hashed twin diverged from d14 exact spans at volume")
      val perReplica = spansHashed
        .groupBy((col("doc_id") / stride).cast("long").as("replica"))
        .agg(count(lit(1)).as("n"),
          // bit_xor: order-independent and overflow-free under ANSI
          // (sum(xxhash64) overflows long); span rows are distinct per
          // doc so xor cancellation can't hide a difference
          expr("bit_xor(xxhash64(doc_id % " + stride +
            "L, span_start, span_end, n_grams))").as("fp"))
        .collect()
      require(perReplica.length == replicas,
        s"${perReplica.length} replicas produced spans, expected $replicas")
      val fps = perReplica.map(r => (r.getLong(1), r.getLong(2))).distinct
      require(fps.length == 1,
        s"replica span sets diverged: ${fps.length} distinct (count, fingerprint) " +
          s"values across $replicas replicas")
      println(s"[stress] OK spans: $replicas replicas x ${nSpans / replicas} " +
        "identical spans each, hashed twin == exact text form")
    }

    // ---- d7b big-star components under volume (r8 verdict #4) ---------
    // The big-star path exists FOR high-diameter graphs, but the dedup
    // corpora above produce tiny-diameter clusters that never exercise
    // it. Build the shape it claims to win on — many parallel CHAINS
    // (diameter 63), node count scaled by the replica factor — and
    // assert all three ways: big-star labels ≡ closed-form truth (chain
    // c's component = its min id), ≡ min-label-propagation output
    // row-for-row, and the executed alternation count is O(log L) while
    // min-label pays O(diameter) rounds. Chain graphs are exactly the
    // k-NN-chain / citation-thread / linked-crawl shape the scaladoc
    // names; this stage is the "does the win materialize at volume"
    // probe, with the counts printed for SURVEY.
    stage("bigstar components at volume") {
      val chainLen = 64L
      val nChains = replicas * 2000L
      val nNodes = nChains * chainLen
      import spark.implicits._
      val chainEdges = spark.range(nNodes)
        .where(col("id") % chainLen =!= (chainLen - 1))
        .select(col("id").as("id1"), (col("id") + 1).as("id2"))
        .repartition(32)
      println(s"[stress]   graph: $nChains chains x $chainLen nodes " +
        s"(diameter ${chainLen - 1}, ${nNodes - nChains} edges)")
      val (bsLabels0, alternations) =
        llm.Components.connectedComponentsBigStarCounted(chainEdges, maxIter = 25)
      val bsLabels = bsLabels0.localCheckpoint(true)
      // closed-form truth: component = floor(id / chainLen) * chainLen
      val wrong = bsLabels
        .where(col("component") =!= (col("id") / chainLen).cast("long") * chainLen)
        .count()
      require(wrong == 0, s"bigstar labels diverge from closed form: $wrong nodes")
      require(bsLabels.count() == nNodes,
        s"bigstar labeled ${bsLabels.count()} of $nNodes nodes")
      val (mlLabels0, rounds) =
        llm.Components.connectedComponentsCounted(chainEdges, maxIter = 80)
      val mlLabels = mlLabels0.localCheckpoint(true)
      require(bsLabels.exceptAll(mlLabels).count() == 0 &&
        mlLabels.exceptAll(bsLabels).count() == 0,
        "bigstar and min-label-propagation disagree on the chain graph")
      // the structural claim, asserted not eyeballed: alternations stay
      // logarithmic while rounds track the diameter
      require(alternations <= 16,
        s"bigstar needed $alternations alternations on a 64-chain — not O(log n)")
      require(rounds >= chainLen / 2,
        s"min-label converged in $rounds rounds on diameter ${chainLen - 1} — " +
          "the chain graph is not exercising the high-diameter case")
      println(s"[stress] OK bigstar: $alternations alternations vs $rounds " +
        s"min-label rounds on diameter ${chainLen - 1}, labels identical + closed-form")
    }
    // ---- d18 index churn (r10 verdict #6) -----------------------------
    // The standing-LSH-index claim under sustained churn: replicas−1
    // append batches land one by one on ONE index built from the base
    // corpus; each batch is probed against everything indexed so far
    // (plus its own within-batch pairs — the probe is cross-set by
    // design), and the ACCUMULATED pair set must equal a from-scratch
    // d3 build on the final corpus, exactly. Equivalence is exact, not
    // probabilistic: both paths share minhashSignatures + banding
    // params, so their candidate sets are identical by construction and
    // both exact-verify — any drift (a stale meta read, a banding
    // mismatch on append, a bucket lost to a bad partition key) breaks
    // row-for-row equality. Appends go through the batch-keyed path the
    // t38 ingest loop uses, so the keyed layout is what churns.
    // needs at least one append batch to mean anything; replicas = 1 is
    // a legal harness input and must not crash the run on a None.get
    if (replicas >= 2) stage("d18 index churn") {
      val (nGrams, hashes, bandsN, tau) = (3, 64, 32, 0.6)
      // NOT `normalized` (that is the replicated LSH corpus): churn wants
      // a base index that the batches then grow
      val baseNorm = base.select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("text")).localCheckpoint(true)
      val idxPath = Scratch.dir("graft_stress_d18_")
      Dedup.buildLshIndex(baseNorm, idxPath, nGrams, hashes, bandsN)
      var standing = baseNorm
      var accumulated: Option[org.apache.spark.sql.DataFrame] = None
      for (k <- 1 until replicas) {
        val batch = baseNorm.select((col("doc_id") + k * stride).as("doc_id"),
            concat(col("text"), lit(s" churn$k")).as("text"))
          .localCheckpoint(true)
        val cross = Dedup.incrementalDedupPairs(idxPath, batch, standing, tau)
          .select(least(col("id1"), col("id2")).as("id1"),
            greatest(col("id1"), col("id2")).as("id2"))
        val within = Dedup.minhashLshPairs(batch, nGrams, hashes, bandsN, tau)
          .select("id1", "id2")
        val round = cross.unionByName(within).localCheckpoint(true)
        accumulated = Some(accumulated.fold(round)(_ unionByName round))
        Dedup.appendLshIndexBatch(batch, idxPath, Dedup.lshBatchKey(k))
        standing = standing.unionByName(batch).localCheckpoint(true)
      }
      val baseline = Dedup.minhashLshPairs(
          standing, nGrams, hashes, bandsN, tau) // standing == final corpus
        .select("id1", "id2").localCheckpoint(true)
      val inc = accumulated.get
        .unionByName(Dedup.minhashLshPairs(baseNorm, nGrams, hashes, bandsN, tau)
          .select("id1", "id2")) // base-internal pairs: indexed before churn began
        .localCheckpoint(true)
      val nInc = inc.count()
      val nBaseline = baseline.count()
      println(s"[stress]   churned-index pairs: $nInc, rebuild pairs: $nBaseline")
      require(inc.exceptAll(baseline).count() == 0 &&
        baseline.exceptAll(inc).count() == 0,
        s"churned index diverged from rebuild: $nInc vs $nBaseline pairs")
      // teeth: every base doc should pair with most of its churn variants
      require(nInc >= nBase * (replicas - 1) / 2,
        s"suspiciously few pairs ($nInc) for $nBase docs x $replicas variants — " +
          "the standing index is not finding cross-batch near-dups")
      println(s"[stress] OK churn: ${replicas - 1} append batches, " +
        s"probe set == from-scratch rebuild ($nInc pairs)")
    }

    // ---- boilerplate hot bucket (r11 verdict: the one `weak`) ---------
    // A crawl corpus's worst LSH shape: one template shared by a large
    // doc population collides ALL copies into the same (band_idx,
    // band_hash) bucket in EVERY band. Pre-guard, that bucket expanded
    // B²/2 candidate rows inside ONE task (the banded self-join keyed the
    // work by bucket); post-guard the posting list chunks through the
    // shuffled block-pair path. Teeth: exact pair count C(B,2) — the
    // candidate set is provably identical to the self-join shape — and
    // the stage completing without a straggler dominating wall-clock.
    stage("boilerplate hot bucket") {
      val hotN = 1200
      val template = "terms of service apply to all pages on this " +
        "website and by continuing you agree to them"
      val hot = spark.range(hotN)
        .select(col("id").as("doc_id"), lit(template).as("text"))
      // salt with a slice of the real corpus so the stage also exercises
      // ordinary buckets alongside the hot one
      val mixed = hot.unionByName(
        base.limit(2000).select((col("doc_id") + hotN).as("doc_id"), col("text")))
      val got = Dedup.minhashLshPairs(mixed, n = 3, numHashes = 32,
          bands = 8, threshold = 0.95)
        .where(col("id1") < hotN && col("id2") < hotN).count()
      val want = hotN.toLong * (hotN - 1) / 2
      require(got == want,
        s"hot-bucket pair count $got != C($hotN,2) = $want — chunked " +
          "expansion dropped or duplicated pairs")
      println(s"[stress]   hot-bucket pairs: $got (= C($hotN,2))")
    }
    spark.stop()
  }
}
