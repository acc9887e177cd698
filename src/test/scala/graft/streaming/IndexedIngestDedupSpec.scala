package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** The t38 ingest loop's exactly-once contract, forced the hard way: a
  * batch whose side effects all landed (pairs published, survivors
  * written, index partitions appended) but whose checkpoint COMMIT never
  * did — the crash window foreachBatch cannot close transactionally —
  * is replayed by deleting the commit marker, and the end state must be
  * IDENTICAL to a clean run. The dangerous failure is not double rows:
  * it is the replayed probe seeing the crashed attempt's own buckets, at
  * which point every replayed doc matches ITSELF (jaccard 1.0), flips
  * to a duplicate, and the survivor set silently diverges. The
  * `beforeBatch` partition filter + batch-keyed overwrites are what
  * close that window.
  */
class IndexedIngestDedupSpec extends SparkSpec {

  test("crash-replay of a committed-side-effects batch leaves state identical (exactly-once)") {
    import spark.implicits._
    val root = graft.Scratch.dir("t38_spec_")
    val stage = s"$root/stage"
    Files.createDirectories(Paths.get(stage))

    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven")
    ).toDF("doc_id", "text")
    Dedup.buildLshIndex(corpus, s"$root/idx", n = 3, numHashes = 64, bands = 32)

    def stageFile(name: String, rows: Seq[(Long, String)]): Unit =
      EventStream.stageOneFile(rows.toDF("doc_id", "text"), stage, name)

    def drain(): Unit = {
      val schema = spark.read.parquet(stage).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      IndexedIngestDedup.ingestLoop(stream, s"$root/idx", corpus,
        s"$root/surv", s"$root/pairs", s"$root/chk", threshold = 0.6)
    }

    // batch 0: 101 near-dups corpus doc 1 (flagged, dropped); 102 survives
    stageFile("b0.parquet", Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (102L, "completely unrelated words that match nothing in the corpus")))
    drain()
    val pairs0 = IndexedIngestDedup.allPairs(spark, s"$root/pairs")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs0 === Set((101L, 1L)), s"clean batch 0: $pairs0")

    // Crash window: every batch-0 side effect is on disk, the commit
    // marker is not — Spark will replay batch 0 (same id, same file).
    val commit0 = Paths.get(s"$root/chk/commits/0")
    assert(Files.exists(commit0), "expected commit marker for batch 0")
    Files.delete(commit0)
    // the local ChecksumFileSystem keeps a .crc sidecar; left behind it
    // makes the replay's atomic re-write of commits/0 collide
    Files.deleteIfExists(Paths.get(s"$root/chk/commits/.0.crc"))

    // batch 1: 201 exact-dups SURVIVOR 102 (must be caught — proves the
    // index append landed); 202 copies flagged 101 (must match corpus
    // doc 1 only — (202,101) would mean a DUPLICATE entered the index);
    // 203 survives.
    stageFile("b1.parquet", Seq(
      (201L, "completely unrelated words that match nothing in the corpus"),
      (202L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (203L, "entirely fresh vocabulary sharing no phrases with anything indexed")))
    drain()

    val pairs = IndexedIngestDedup.allPairs(spark, s"$root/pairs")
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    // no self-matches (the replay-sees-own-buckets failure), no dups, and
    // exactly the clean-run pair set
    assert(pairs.forall { case (a, b) => a != b },
      s"replayed batch matched itself: $pairs")
    assert(pairs.size === pairs.toSet.size, s"duplicate pairs: $pairs")
    assert(pairs.toSet === Set((101L, 1L), (201L, 102L), (202L, 1L)),
      s"pair set after replay: $pairs")

    // survivor store: each survivor exactly once, dups absent
    val surv = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/surv").select("doc_id").as[Long].collect().toSeq
    assert(surv.sorted === Seq(102L, 203L), s"survivors: $surv")

    // index: batch 0's partitions hold exactly ONE copy of 102's bands
    val b0Bands = spark.read.parquet(s"$root/idx/bands")
      .where(col("ingest_batch") === Dedup.lshBatchKey(0))
    assert(b0Bands.count() === 32L,
      "replay must dynamic-overwrite, not double, the batch's buckets")
    assert(b0Bands.select("doc_id").distinct().as[Long].collect().toSeq === Seq(102L))

    // ---- mid-ingest DELETION (d20 composed with the t38 loop) --------
    // Tombstone survivor 102 between drains: the next batch's probe must
    // not see it (its exact dup re-enters as a fresh survivor instead of
    // flagging), while the rest of the standing index keeps matching.
    // 102's text lingering in the survivor store is harmless — the probe
    // subtracts at the BANDS, so no candidate can form to reach it.
    Dedup.tombstoneLshIds(spark, s"$root/idx", Seq(102L).toDF("doc_id"))
    stageFile("b2.parquet", Seq(
      (301L, "completely unrelated words that match nothing in the corpus"), // = deleted 102
      (302L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")))  // ~ corpus 1
    drain()
    // only batch 2's OWN pairs — batch 1 legitimately published
    // (201, 102) before the deletion and history is immutable
    val pairs2 = IndexedIngestDedup.allPairs(spark, s"$root/pairs")
      .select("id1", "id2").as[(Long, Long)].collect().toSet -- pairs.toSet
    assert(!pairs2.exists(_._2 == 102L),
      s"deleted doc 102 must not match mid-ingest: $pairs2")
    assert(pairs2 === Set((302L, 1L)), s"undeleted corpus must keep matching: $pairs2")
    // 301 (the dup of the DELETED doc) survived and is now indexed itself
    val surv2 = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/surv").select("doc_id").as[Long].collect().toSeq
    assert(surv2.sorted === Seq(102L, 203L, 301L), s"survivors: $surv2")
  }
}
