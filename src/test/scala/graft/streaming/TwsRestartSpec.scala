package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Fixture processors for the state-evolution test. Top-level (not
  * spec-inner) so their closures capture no test-class state — the
  * processor ships to executors.
  *
  * V1 holds `CtrV1(n)`; V2 reads the SAME state variable as
  * `CtrV2(n, cents)` where the added field is an Option — the
  * production upgrade path: a deployed pipeline gains a feature and its
  * checkpointed state must carry forward, with the new field defaulting
  * for every pre-upgrade key. Schema evolution requires the Avro state
  * encoding (`spark.sql.streaming.stateStore.encodingFormat=avro`);
  * under the default UnsafeRow encoding the restart fails fast with a
  * schema-incompatibility error instead of corrupting state (also
  * pinned below).
  */
private[streaming] object TwsRestartFixtures {
  final case class RIn(user_id: Long, cents: Long)
  final case class ROut(user_id: Long, n: Long, cents: Long)
  final case class CtrV1(n: Long)
  final case class CtrV2(n: Long, cents: Option[Long])

  final class CtrProcV1 extends StatefulProcessor[Long, RIn, ROut] {
    @transient private var st: ValueState[CtrV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CtrV1]("ctr", Encoders.product[CtrV1],
        TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[RIn],
                                 tv: TimerValues): Iterator[ROut] = {
      var c = if (st.exists()) st.get() else CtrV1(0L)
      rows.foreach(_ => c = CtrV1(c.n + 1))
      st.update(c)
      Iterator.single(ROut(user, c.n, -1L))
    }
  }

  final class CtrProcV2 extends StatefulProcessor[Long, RIn, ROut] {
    @transient private var st: ValueState[CtrV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CtrV2]("ctr", Encoders.product[CtrV2],
        TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[RIn],
                                 tv: TimerValues): Iterator[ROut] = {
      var c = if (st.exists()) st.get() else CtrV2(0L, None)
      // pre-evolution state reads with cents = None → defaults to 0 here
      rows.foreach(e =>
        c = CtrV2(c.n + 1, Some(c.cents.getOrElse(0L) + e.cents)))
      st.update(c)
      Iterator.single(ROut(user, c.n, c.cents.getOrElse(-1L)))
    }
  }
}

/** t34: the transformWithState surfaces CheckpointSpec (plain file-sink
  * restart) and TwsTtlSpec (wall-clock expiry) leave uncovered:
  *
  *   1. a CHECKPOINTED RESTART of t24's TTL counter — counts continue
  *      exactly where the stopped query left off, verified both through
  *      the sink AND by reading the checkpoint's state store back with
  *      the t29 statestore reader;
  *   2. STATE SCHEMA EVOLUTION — a restarted query whose ValueState
  *      case class gained an Option field (Avro encoding) reads every
  *      pre-upgrade key with the new field defaulting, and continues
  *      counting on the evolved schema;
  *   3. the same evolution under the default UnsafeRow encoding fails
  *      FAST (schema incompatibility), not silently.
  */
class TwsRestartSpec extends SparkSpec {

  import TwsRestartFixtures._

  private def stage(dir: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.coalesce(1).write.mode("append").parquet(dir)

  test("TTL counter continues exactly across a checkpointed restart; statestore agrees") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("tws_restart_src_").toString
    val out = Files.createTempDirectory("tws_restart_out_").toString
    val ckpt = Files.createTempDirectory("tws_restart_ckpt_").toString
    val ss = EventStream.ttlSession(spark)
    import ss.implicits._

    def events(ids: Range, user: Long, tpe: String) =
      ids.map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i),
        user, tpe, 1.5)).toDF("event_id", "ts", "user_id", "event_type", "value")

    // stage 1: user 1 ×3 (click), user 2 ×2 (view)
    stage(src, events(0 until 3, 1L, "click")
      .unionByName(events(3 until 5, 2L, "view")))
    val schema = ss.read.parquet(src).schema

    def runOnce(): Unit = {
      val stream = ss.readStream.schema(schema).parquet(src)
      val q = TransformWithStateOps
        .ttlCounter(stream, java.time.Duration.ofMinutes(10))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // stage 2 arrives while the query is DOWN: user 1 ×2 (a NEW type),
    // user 3 appears for the first time
    stage(src, events(5 until 7, 1L, "purchase")
      .unionByName(events(7 until 8, 3L, "click")))
    runOnce()

    // counts continue exactly: the restarted query saw ONLY stage 2, so
    // user 1 reaching n=5 with 2 types proves its state carried over
    val finalCounts = ss.read.parquet(out)
      .groupBy("user_id").agg(max("n").as("n"), max("n_types").as("nt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(finalCounts === Map(1L -> (5L, 2L), 2L -> (2L, 1L), 3L -> (1L, 1L)))

    // the checkpoint's own state store must hold the same totals (t29
    // reader pointed at a transformWithState variable)
    val snap = spark.read.format("statestore")
      .option("stateVarName", "n").load(ckpt)
    def flattenLong(x: Any): Long = x match {
      case l: Long => l
      case i: Int => i.toLong
      case r: org.apache.spark.sql.Row => flattenLong(r.get(0))
      case other => sys.error(s"unexpected state cell: $other")
    }
    val state = snap.select("key", "value").collect()
      .map(r => flattenLong(r.get(0)) -> flattenLong(r.get(1))).toMap
    assert(state === Map(1L -> 5L, 2L -> 2L, 3L -> 1L),
      s"statestore snapshot diverged: $state")
  }

  private def evolutionSession(avro: Boolean) = {
    val ss = EventStream.statefulSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.encodingFormat",
      if (avro) "avro" else "unsaferow")
    ss
  }

  test("state schema evolution: added Option field defaults for pre-upgrade keys (avro)") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("tws_evo_src_").toString
    val out = Files.createTempDirectory("tws_evo_out_").toString
    val ckpt = Files.createTempDirectory("tws_evo_ckpt_").toString
    val ss = evolutionSession(avro = true)
    import ss.implicits._

    def run(proc: StatefulProcessor[Long, RIn, ROut]): Unit = {
      val stream = ss.readStream
        .schema(ss.read.parquet(src).schema).parquet(src)
        .as[RIn]
        .groupByKey(_.user_id)
        .transformWithState(proc, TimeMode.None(), OutputMode.Append())
      val q = stream.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    // stage 1 under V1: user 1 ×3, user 2 ×1 — no cents field in state
    stage(src, Seq((1L, 10L), (1L, 10L), (1L, 10L), (2L, 40L))
      .toDF("user_id", "cents"))
    run(new CtrProcV1)
    // stage 2 under V2 (schema evolved): user 1 ×2, user 3 new
    stage(src, Seq((1L, 7L), (1L, 8L), (3L, 100L)).toDF("user_id", "cents"))
    run(new CtrProcV2)

    val fin = ss.read.parquet(out)
      .groupBy("user_id").agg(max("n").as("n"), max("cents").as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // user 1: n continues 3→5; cents defaults to 0 for the pre-upgrade
    // state, then accumulates ONLY stage-2 cents (7+8)
    assert(fin(1L) === (5L, 15L), s"evolved user-1 state wrong: $fin")
    // user 2: untouched in stage 2 → last emitted row is V1's sentinel
    assert(fin(2L) === (1L, -1L))
    // user 3: born on the evolved schema
    assert(fin(3L) === (1L, 100L))
  }

  test("the same evolution under unsaferow encoding fails fast, not silently") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("tws_evo2_src_").toString
    val out = Files.createTempDirectory("tws_evo2_out_").toString
    val ckpt = Files.createTempDirectory("tws_evo2_ckpt_").toString
    val ss = evolutionSession(avro = false)
    import ss.implicits._

    def run(proc: StatefulProcessor[Long, RIn, ROut]): Unit = {
      val stream = ss.readStream
        .schema(ss.read.parquet(src).schema).parquet(src)
        .as[RIn]
        .groupByKey(_.user_id)
        .transformWithState(proc, TimeMode.None(), OutputMode.Append())
      val q = stream.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(src, Seq((1L, 10L)).toDF("user_id", "cents"))
    run(new CtrProcV1)
    stage(src, Seq((1L, 7L)).toDF("user_id", "cents"))
    val e = intercept[Exception] { run(new CtrProcV2) }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("schema") || msg.toLowerCase.contains("state"),
      s"expected a state-schema incompatibility error, got: $e")
  }
}
