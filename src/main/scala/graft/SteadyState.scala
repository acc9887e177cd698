package graft

import org.apache.spark.sql.functions._

/** Steady-state isolates for the index-lifecycle entries (r11 verdict
  * item 2): the bench entries for t38/t18/t39/d20 deliberately pay the
  * FULL lifecycle per invocation — index build + staged micro-batches +
  * drain — because that is the operator under test. The cost that
  * matters at 100 TB, though, is the PER-BATCH hot path once the index
  * stands: probe, append, delete, tombstoned-probe. This main pre-builds
  * each index ONCE (untimed) and then times only those steady-state
  * steps, so a regression in the hot path can't hide inside ~38 s of
  * fixed build cost in the bench tail.
  *
  *   runMain graft.SteadyState [sfDir]
  *
  * Prints one `[steady] <name>  <sec>` line per measurement (best of the
  * timed repeats, after one warm-up). Numbers are recorded in SURVEY §8l
  * and referenced from the bench notes; the driver's BENCH json is
  * unchanged.
  */
object SteadyState {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Dedup, Similarity}

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one warm-up + 2 timed repeats, report the min — the steady-state
    // number should not include first-touch JIT/codegen compilation
    def report[A](name: String, repeats: Int = 2)(f: => A): Unit = {
      f
      val best = (1 to repeats).map(_ => time(f)).min
      println(f"[steady] $name%-28s $best%7.3f s")
    }

    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val emb = Tables.t(spark, sfDir, "embeddings")

    // ---- t38/d18: LSH probe + batch append against a standing index --
    val lshDir = Scratch.dir("graft_ss_lsh_")
    Dedup.buildLshIndex(docs, lshDir, n = 3, numHashes = 64, bands = 16)
    val stride = docs.agg(max("doc_id")).head.getLong(0) + 1
    val delta = docs.limit(500)
      .select((col("doc_id") + stride).as("doc_id"),
        concat(col("text"), lit(" probe")).as("text"))
      .localCheckpoint(true)
    report("t38_probe_batch") {
      Dedup.incrementalDedupPairs(lshDir, delta, docs, threshold = 0.5).count()
    }
    // append is a WRITE — each repeat lands in a fresh batch partition,
    // which is exactly the steady-state shape (every micro-batch is new)
    var batchNo = 0
    report("t38_append_batch") {
      Dedup.appendLshIndexBatch(delta, lshDir, Dedup.lshBatchKey(batchNo))
      batchNo += 1
    }

    // ---- d20: tombstoned-probe serving cost (compaction is a full
    //      rewrite BY DESIGN — its cost is the d20 bench entry itself) --
    Dedup.tombstoneLshIds(spark,
      lshDir, docs.limit(200).select("doc_id"), "doc_id")
    report("d20_probe_tombstoned") {
      Dedup.incrementalDedupPairs(lshDir, delta, docs, threshold = 0.5).count()
    }

    // ---- t18: IVF-PQ maintain, append branch (delta under threshold) --
    val ivfWork = Scratch.dir("graft_ss_ivf_")
    val corpusDir = s"$ivfWork/corpus"
    emb.filter(col("vec_id") % 10 =!= 0)
      .write.parquet(s"$corpusDir/embeddings.parquet/base")
    val base = streaming.VectorIngest.readCorpusStore(spark, corpusDir)
    val idxPath = Similarity.ivfpqIndexPath(corpusDir, 16, 8, 16, 2)
    Similarity.saveIvfPq(
      Similarity.buildIvfPq(base, nlist = 16, m = 8, ksub = 16), idxPath)
    val embDelta = emb.filter(col("vec_id") % 100 === 0)
      .localCheckpoint(true)
    // each repeat re-appends the same delta into the store then maintains
    // — the grown corpus creeps a little per repeat, which only makes the
    // measured append path marginally MORE expensive (conservative)
    var part = 0
    report("t18_maintain_append") {
      // fresh ids per repeat — the index id namespace is permanent, so a
      // repeated append must look like a NEW micro-batch, not a replay
      val shifted = embDelta.withColumn("vec_id", col("vec_id") + part * 1000000L)
      shifted.write.mode("append").parquet(s"$corpusDir/embeddings.parquet/ss$part")
      part += 1
      val grown = streaming.VectorIngest.readCorpusStore(spark, corpusDir)
      Similarity.maintainIvfPq(spark, corpusDir,
        shifted, grown, nlist = 16, m = 8, ksub = 16,
        maxDeltaFraction = 0.9)
    }

    // ---- t39: one retraction-batch log append + the pruned probe -----
    report("t39_delete_batch") {
      Similarity.tombstoneIds(spark, idxPath,
        emb.filter(col("vec_id") % 500 === 0).select("vec_id"))
    }
    val grown = streaming.VectorIngest.readCorpusStore(spark, corpusDir)
    report("t39_probe_after_delete") {
      Similarity.ivfpqQuery(
        Similarity.loadIvfPq(spark, idxPath, grown),
        emb.filter(col("vec_id") % 250 === 0), k = 5, nprobe = 4).count()
    }

    spark.stop()
  }
}
