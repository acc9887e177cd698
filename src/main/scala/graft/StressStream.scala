package graft

import graft.streaming.{EventStream, IngestDedup}
import org.apache.spark.sql.functions._

/** Streaming state-volume probe — the [[Stress]]/[[StressGraph]]
  * discipline applied to the stateful suite: replay the events table N×
  * as N separate micro-batches (one file per trigger) through the
  * event-time-timeout sessionizer (t16's kernel) on RocksDB, and ASSERT
  * from the engine's own state-store metrics that
  *   (a) state stays BOUNDED: watermark-driven timeout eviction returns
  *       state to ~one row per live user after every replay epoch, so
  *       max state rows is O(users), never O(users × epochs); and
  *   (b) per-micro-batch latency stays FLAT: the last epochs process no
  *       slower than the first (state that secretly accumulates shows up
  *       here first, before it OOMs anything).
  * Then replay the documents table N× (ids restriped per replica)
  * through the MinHash ingest dedup (t12's kernel) and assert its state
  * is KEY-bounded: exactly one state row per (band, band-hash) bucket
  * ever seen, holding ids only — resident bytes per stored id stay under
  * a small constant.
  *
  * Each replica shifts event time forward by (span + 2·gap + delay), so
  * every epoch's sessions are closed by the next epoch's watermark — the
  * eviction path is exercised N−1 times, not once at drain.
  *
  * Usage: runMain graft.StressStream [replicas] [sfDir]
  */
object StressStream {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(12)
    require(replicas >= 2, s"replicas must be >= 2: $replicas")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val parent = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    parent.sparkContext.setLogLevel("WARN")
    val spark = EventStream.statefulSession(parent)

    def stage[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-stream] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val work = graft.Scratch.dir("graft-stress-stream")

    // ---- t16: sessionization with event-time timeouts under replay ----
    val gapMinutes = 30
    val base = Tables.t(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val (minUs, maxUs, nUsers) = {
      val r = base.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
        countDistinct(col("user_id"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // per-epoch shift: span + watermark delay (1h) + 2·gap, so epoch k+1's
    // watermark passes every epoch-k session end + gap — full eviction
    val shift = (maxUs - minUs) + 3600L * 1000000L + 2 * gapMinutes * 60L * 1000000L
    stage(s"write $replicas event epochs") {
      (0 until replicas).foreach { k =>
        base.withColumn("ts",
            timestamp_micros(unix_micros(col("ts")) + lit(k * shift)))
          .coalesce(1)
          .write.mode("overwrite").parquet(f"$work%s/events/r$k%03d")
      }
      // explicit strictly-increasing mtimes: an mtime tie between epochs
      // replays them out of order and the watermark drops the earlier one
      EventStream.stampMtimeOrder(
        (0 until replicas).map(k => f"$work%s/events/r$k%03d"))
    }

    val evStream = Tables.restoreTs(
      spark.readStream
        .schema(spark.read.parquet(s"$work/events/r000").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/events/r*"))
    val sessions = EventStream.sessionizeWithTimeout(evStream, gapMinutes)
    val q = sessions.toDF().writeStream
      .format("memory").queryName("stress_t16").outputMode("append")
      .option("checkpointLocation", s"$work/chk_t16")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stage("drain t16 sessionizer")(q.awaitTermination())
    val prog = q.recentProgress.toSeq
      .filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
    println(f"[stress-stream] ${"batch"}%5s ${"inputRows"}%10s " +
      f"${"stateRows"}%10s ${"stateMB"}%8s ${"ms"}%7s")
    prog.foreach { p =>
      val so = p.stateOperators.head
      println(f"[stress-stream] ${p.batchId}%5d ${p.numInputRows}%10d " +
        f"${so.numRowsTotal}%10d ${so.memoryUsedBytes / 1e6}%8.1f " +
        f"${p.durationMs.get("triggerExecution")}%7d")
    }
    val stateRows = prog.map(_.stateOperators.head.numRowsTotal)
    val durs = prog.map(_.durationMs.get("triggerExecution").toLong)
    val sessCount = spark.table("stress_t16").count()

    // (a) bounded state: even the PEAK holds at most the live epoch's
    // users plus one not-yet-evicted epoch — never O(users × epochs)
    require(stateRows.max <= 3 * nUsers,
      s"state rows peaked at ${stateRows.max} for $nUsers users — eviction broke")
    require(stateRows.last <= 2 * nUsers,
      s"final state ${stateRows.last} rows — timed-out sessions not removed")
    // (b) flat latency: compare medians of the first and last thirds
    // (skip batch 0 — it pays state-store setup)
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val third = math.max(1, durs.size / 3)
    val early = median(durs.slice(1, 1 + third))
    val late = median(durs.takeRight(third))
    require(late <= 3 * early,
      s"per-batch latency grew: early median $early ms → late median $late ms")
    // every epoch emits every user's sessions eventually (data path or
    // timeout path); final-epoch sessions still open at drain never emit
    require(sessCount >= (replicas - 1) * nUsers,
      s"only $sessCount sessions for ${replicas}×$nUsers user-epochs")
    println(s"[stress-stream] OK t16: $sessCount sessions, state peak " +
      s"${stateRows.max} rows (${nUsers} users), latency $early→$late ms")

    // ---- t12: MinHash ingest dedup — key-bounded, ids-only state ------
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val docStride = docs.agg(max("doc_id")).head().getLong(0) + 1
    stage(s"write $replicas doc epochs") {
      (0 until replicas).foreach { k =>
        docs.withColumn("doc_id", col("doc_id") + lit(k * docStride))
          .coalesce(1)
          .write.mode("overwrite").parquet(f"$work%s/docs/r$k%03d")
      }
      EventStream.stampMtimeOrder(
        (0 until replicas).map(k => f"$work%s/docs/r$k%03d"))
    }
    val (bands, rowsPerBand) = (8, 2)
    val docStream = spark.readStream
      .schema(spark.read.parquet(s"$work/docs/r000").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/docs/r*")
    val pairs = IngestDedup.candidatePairs(docStream, n = 5,
      numHashes = bands * rowsPerBand, bands = bands)
    // parquet sink, not memory: 12 identical replicas make every epoch-0
    // bucket pair off with every later replica — millions of candidate
    // rows that belong on disk, not in the driver
    val q2 = pairs.toDF("id1", "id2").writeStream
      .format("parquet").option("path", s"$work/pairs")
      .outputMode("append")
      .option("checkpointLocation", s"$work/chk_t12")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stage("drain t12 ingest dedup")(q2.awaitTermination())
    val prog2 = q2.recentProgress.toSeq
      .filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
    val so2 = prog2.last.stateOperators.head
    val nDocs = docs.count()
    // key-bounded: one state row per distinct (band, hash) bucket — and
    // every replica's docs land in epoch-0's buckets (identical text), so
    // rows must NOT scale with replicas
    val bucketBound = bands * nDocs
    require(so2.numRowsTotal <= bucketBound,
      s"${so2.numRowsTotal} state rows > $bucketBound buckets — state is not key-bounded")
    // ids-only: resident ids = docs × replicas × bands; bytes per id must
    // stay O(10s) (id + per-bucket key/versioning overhead amortized)
    // ids-only: resident ids = docs × replicas × bands. The bound is loose
    // (256 B — RocksDB reports block-cache/memtable baseline too) but a
    // state that carried text (~½ KB/doc/bucket) or shingle sets would
    // blow through it
    val residentIds = nDocs * replicas * bands
    val bytesPerId = so2.memoryUsedBytes.toDouble / residentIds
    require(bytesPerId <= 256.0,
      f"$bytesPerId%.1f resident bytes per stored id — state is carrying more than ids")
    println(f"[stress-stream] OK t12: ${so2.numRowsTotal} bucket rows " +
      f"(≤ $bucketBound), ${so2.memoryUsedBytes / 1e6}%.1f MB for " +
      f"$residentIds ids = $bytesPerId%.1f B/id, " +
      f"${spark.read.parquet(s"$work/pairs").count()} candidate pairs")

    // ---- t17/t20: stream-stream FULL OUTER join — BOTH sides' state ----
    // The outer-join family holds clicks AND purchases in state until the
    // watermark closes their match windows. Replay N shifted epochs (ids
    // restriped so every row names its epoch) and assert:
    //   (a) state stays bounded at O(one live epoch's join rows), never
    //       O(rows × epochs);
    //   (b) every non-final epoch's unmatched rows emit EXACTLY ONCE, and
    //       never before their epoch's last input batch (a premature null
    //       would be a retractable emission, which append mode forbids);
    //   (c) matched pairs emit exactly once per epoch, all epochs.
    val windowMinutes = 10
    // per-epoch shift: span + watermark delay (1h) + window + 1 min margin
    // — epoch k+1's watermark passes every epoch-k click's expiry
    // (c_ts + window) and purchase's own time, so both null directions
    // evict between epochs, not once at drain
    val jshift = (maxUs - minUs) + 3600L * 1000000L +
      windowMinutes * 60L * 1000000L + 60L * 1000000L
    val idStride = base.agg(max("event_id")).head().getLong(0) + 1
    stage(s"write $replicas join epochs") {
      (0 until replicas).foreach { k =>
        base.withColumn("ts",
            timestamp_micros(unix_micros(col("ts")) + lit(k * jshift)))
          .withColumn("event_id", col("event_id") + lit(k * idStride))
          .coalesce(1)
          .write.mode("overwrite").parquet(f"$work%s/jevents/r$k%03d")
      }
      EventStream.stampMtimeOrder(
        (0 until replicas).map(k => f"$work%s/jevents/r$k%03d"))
    }
    val jStream = Tables.restoreTs(
      spark.readStream
        .schema(spark.read.parquet(s"$work/jevents/r000").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/jevents/r*"))
    val joinedOut = s"$work/joined"
    val q3 = EventStream.clickPurchaseFullJoin(jStream, windowMinutes)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$work/chk_t20")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // batch id rides along so "when did this row emit" is queryable
        b.withColumn("_batch", lit(id)).write.mode("append").parquet(joinedOut)
        ()
      }
      .start()
    stage("drain t20 full outer join")(q3.awaitTermination())

    // batch replay of ONE epoch = the per-epoch expectation (epochs are
    // time-disjoint by construction, so the streamed answer is this
    // expectation repeated with restriped ids)
    val ep0 = spark.read.parquet(s"$work/jevents/r000")
    val bc = ep0.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val bp = ep0.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val bj = bc.join(bp,
      col("user_id") === col("p_user") && col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      "full_outer").localCheckpoint(false)
    val m0 = bj.filter(col("c_id").isNotNull && col("p_id").isNotNull).count()
    val uc0 = bj.filter(col("p_id").isNull).select("c_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val up0 = bj.filter(col("c_id").isNull).select("p_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val perEpochJoinRows = bc.count() + bp.count()

    val res = spark.read.parquet(joinedOut).localCheckpoint(false)
    // (c) matched pairs: exactly once, every epoch including the last
    // (the data path emits matches immediately; no watermark needed)
    val matched = res.filter(col("c_id").isNotNull && col("p_id").isNotNull)
    require(matched.count() == replicas * m0,
      s"${matched.count()} matched rows, expected ${replicas}×$m0")
    require(matched.groupBy("c_id", "p_id").count()
        .filter(col("count") > 1).count() == 0, "a matched pair emitted twice")
    // (b) unmatched rows: exactly once, never premature. An epoch-k null
    // can only emit after the watermark advanced past epoch k — which
    // requires epoch k+1's input (or the trailing no-data flush), so
    // _batch must exceed k. The final epoch's stragglers past the last
    // watermark stay unemitted by contract.
    def onceAndNotPremature(nullSide: String, idCol: String,
                            expected: Set[Long]): Int = {
      val rows = res.filter(col(nullSide).isNull)
        .select(col(idCol).cast("long").as("id"), col("_batch"))
        .collect()
      val dup = rows.groupBy(_.getLong(0)).filter(_._2.size > 1)
      require(dup.isEmpty,
        s"${dup.size} unmatched $idCol rows emitted more than once")
      var fullEpochs = 0
      (0 until replicas).foreach { k =>
        val want = expected.map(_ + k * idStride)
        val got = rows.filter(r => r.getLong(0) / idStride == k)
        got.foreach { r =>
          require(r.getAs[Long]("_batch") > k,
            s"epoch-$k unmatched $idCol ${r.getLong(0)} emitted in batch " +
              s"${r.getAs[Long]("_batch")} — premature null")
          require(want.contains(r.getLong(0)),
            s"unexpected unmatched $idCol ${r.getLong(0)} in epoch $k")
        }
        if (got.map(_.getLong(0)).toSet == want) fullEpochs += 1
      }
      fullEpochs
    }
    val fullC = onceAndNotPremature("p_id", "c_id", uc0)
    val fullP = onceAndNotPremature("c_id", "p_id", up0)
    // every epoch the watermark could close must have emitted COMPLETELY
    // — all replicas−1 of them (epoch k closes on epoch k+1's input or
    // the AvailableNow trailing no-data flush; only the FINAL epoch's
    // stragglers stay unemitted by contract). Exact, not ≥−1: a silently
    // dropped epoch must fail here, not hide behind a tolerance.
    require(fullC == replicas - 1 && fullP == replicas - 1,
      s"only $fullC/$fullP of ${replicas - 1} closable epochs fully emitted")
    // (a) bounded state from the engine's own metrics
    val prog3 = q3.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
    val joinStateRows = prog3.map(_.stateOperators.head.numRowsTotal)
    require(joinStateRows.max <= 3 * perEpochJoinRows,
      s"join state peaked at ${joinStateRows.max} rows for " +
        s"$perEpochJoinRows join rows/epoch — eviction broke")
    println(s"[stress-stream] OK t20: ${replicas}×$m0 matches, " +
      s"$fullC/$fullP fully-emitted unmatched epochs (clicks/purchases, " +
      s"of ${replicas - 1} closable), state peak ${joinStateRows.max} rows " +
      s"(≤ 3×$perEpochJoinRows)")

    parent.stop()
  }
}
