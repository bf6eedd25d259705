package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.DecayedLeaderboard
import graft.streaming.DecayedLeaderboard.{KeyScore, ScoredEvent}
import graft.streaming.Frontier

/** State-schema EVOLUTION policy: what actually happens when a stateful
  * processor's state gains a field against an existing checkpoint — the
  * #1 operational event in a long-lived streaming deployment. The specs
  * pin the engine behavior per state type so the migration policy
  * documented on each processor is tested, not asserted:
  *
  *   - default encoding (unsaferow): the state schema is FROZEN at the
  *     first query start; a restart with a widened state fails LOUDLY
  *     (no silent misread) — the migration path is the warm-start export
  *     (runTwsWarm / sessionsWarm / heavyHittersWarm), not the checkpoint;
  *   - avro encoding (`spark.sql.streaming.stateStore.encodingFormat =
  *     avro`, chosen at FIRST start and recorded in the checkpoint):
  *     adding a nullable field to a ValueState is a supported in-place
  *     evolution — restored rows carry the old fields and null for the
  *     new one;
  *   - flatMapGroupsWithState (HDFS store): schema compatibility is
  *     checked at restart; a widened GroupState fails loudly. */

/** v2 state shapes live OUTSIDE the suite class: Spark cannot encode
  * inner classes of a test instance. */
object StateSchemaEvolutionSpec {
  // ---- v2 shapes: DecayState + one added field ---------------------------

  /** [[DecayedLeaderboard.DecayState]] widened by one nullable field — the
    * canonical "we now also track how many batches touched the key"
    * operational change. */
  case class DecayStateV2(score: Double, refMicros: Long,
                          touches: Option[Long])
  case class KeyScoreV2(key: String, score: Double, refMicros: Long,
                        touches: Option[Long])

  /** The sessionizer's buffer element widened from a bare Long to a
    * struct — a TYPE change, not a field-add: no encoding can evolve it. */
  case class TimedEvent(tsMs: Long, weight: Double)

  // ---- stream-stream join input shapes (v1 + one added nullable field) --
  case class Imp(ik: String, its: Timestamp)
  case class ImpV2(ik: String, its: Timestamp, campaign: Option[Long])
  case class Click(ck: String, cts: Timestamp)
  class SessionProcessorV2(gapMs: Long)
      extends StatefulProcessor[String, (String, Timestamp),
        graft.streaming.TwsSessions.Session] {
    @transient private var buf:
      org.apache.spark.sql.streaming.ListState[TimedEvent] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[TimedEvent]("event_times",
        Encoders.product[TimedEvent], TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, Timestamp)], timerValues: TimerValues)
        : Iterator[graft.streaming.TwsSessions.Session] = {
      rows.foreach(r => buf.appendValue(TimedEvent(r._2.getTime, 1.0)))
      Iterator.empty
    }
  }

  /** The MG counters' map VALUE widened from a bare Long to a struct. */
  case class CountStamp(c: Long, firstSeenMs: Option[Long])
  class MgProcessorV2(capacity: Int)
      extends StatefulProcessor[String, (String, String),
        graft.streaming.StreamHeavyHitters.Hit] {
    @transient private var counters:
      org.apache.spark.sql.streaming.MapState[String, CountStamp] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, CountStamp]("counters",
        Encoders.STRING, Encoders.product[CountStamp], TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, String)], timerValues: TimerValues)
        : Iterator[graft.streaming.StreamHeavyHitters.Hit] = {
      rows.foreach(r => counters.updateValue(r._2, CountStamp(1L, None)))
      Iterator.empty
    }
  }

  // fMGWS (the budget-processor API): v1 and v2 of a per-key GroupState
  case class FmgwsV1(n: Long)
  case class FmgwsV2(n: Long, lastMs: Option[Long])

  /** The v2 processor: same state NAME ("decay") and semantics, wider
    * state row. What a team ships after adding a field. */
  class DecayProcessorV2(halfLifeMicros: Long)
      extends StatefulProcessor[String, ScoredEvent, KeyScoreV2] {
    @transient private var st: ValueState[DecayStateV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DecayStateV2]("decay",
        Encoders.product[DecayStateV2], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[ScoredEvent],
        timerValues: TimerValues): Iterator[KeyScoreV2] = {
      val prev = if (st.exists()) Option(st.get()) else None
      val folded = DecayedLeaderboard.foldGroup(rows.toSeq,
        prev.map(p => DecayedLeaderboard.DecayState(p.score, p.refMicros)),
        halfLifeMicros)
      val restoredTouches = prev.flatMap(_.touches)
      val s = DecayStateV2(folded.score, folded.refMicros,
        Some(restoredTouches.getOrElse(0L) + 1L))
      st.update(s)
      Iterator.single(KeyScoreV2(key, s.score, s.refMicros,
        prev.map(p => p.touches.getOrElse(0L))))
    }
  }

}

class StateSchemaEvolutionSpec extends SparkTestBase {

  import spark.implicits._
  import StateSchemaEvolutionSpec._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Every message down the cause chain, for asserting on engine errors
    * that arrive wrapped in StreamingQueryException. */
  private def messages(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ messages(t.getCause)

  // the memory sink refuses checkpoint recovery — collect via foreachBatch
  private def runV1(in: MemoryStream[ScoredEvent], ckpt: String,
                    sink: scala.collection.mutable.Set[KeyScore]) =
    DecayedLeaderboard.runTws(in.toDS(), 1000000L)
      .writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[KeyScore], _: Long) =>
        val rows = batch.collect()
        sink.synchronized { sink ++= rows }; ()
      }.start()

  private def runV2(in: MemoryStream[ScoredEvent], ckpt: String,
                    sink: scala.collection.mutable.Set[KeyScoreV2]) =
    in.toDS().groupByKey(_.key)
      .transformWithState(new DecayProcessorV2(1000000L),
        TimeMode.None(), OutputMode.Update())
      .writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[KeyScoreV2], _: Long) =>
        val rows = batch.collect()
        sink.synchronized { sink ++= rows }; ()
      }.start()

  test("TWS ValueState + DEFAULT (unsaferow) encoding: a state row that " +
    "gained a field fails the restart LOUDLY — the schema is frozen at " +
    "first start; migration goes through the warm-start export") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("sse_usr").toString
      val in = MemoryStream[ScoredEvent]
      val sinkA = scala.collection.mutable.Set.empty[KeyScore]
      val qA = runV1(in, ckpt, sinkA)
      in.addData(ScoredEvent("k", 1000000L, 4.0)); qA.processAllAvailable()
      qA.stop()

      val sinkB = scala.collection.mutable.Set.empty[KeyScoreV2]
      in.addData(ScoredEvent("k", 2000000L, 1.0))
      val ex = intercept[Exception] {
        val qB = runV2(in, ckpt, sinkB)
        qB.processAllAvailable()
        qB.stop()
      }
      val all = messages(ex).mkString(" | ").toLowerCase
      assert(all.contains("schema"),
        s"the widened state must fail the schema check loudly, got: $all")
    }
  }

  test("TWS ValueState + AVRO encoding: adding a nullable field is an " +
    "in-place evolution — the restart succeeds, restored rows carry the " +
    "old fields and None for the new one") {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider,
      "spark.sql.streaming.stateStore.encodingFormat" -> "avro") {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("sse_avro").toString
      val in = MemoryStream[ScoredEvent]
      val sinkA = scala.collection.mutable.Set.empty[KeyScore]
      val qA = runV1(in, ckpt, sinkA)
      in.addData(ScoredEvent("k", 1000000L, 4.0)); qA.processAllAvailable()
      qA.stop()

      val sinkB = scala.collection.mutable.Set.empty[KeyScoreV2]
      in.addData(ScoredEvent("k", 2000000L, 1.0))
      val qB = runV2(in, ckpt, sinkB)
      qB.processAllAvailable()
      qB.stop()
      val got = sinkB.toSet
      // the v1 state restored: 4.0 aged one half-life (1s -> 2s) + 1.0;
      // the ADDED field reads as absent for a pre-evolution row
      assert(got === Set(KeyScoreV2("k", 3.0, 2000000L, Some(0L))),
        s"restored v1 state must fold correctly with the widened schema, " +
          s"got $got")
    }
  }

  test("TWS ListState (the session buffer): widening the ELEMENT type " +
    "from Long to a struct fails the restart loudly under BOTH encodings " +
    "— a type change is never an evolution; the migration path is the " +
    "sessionsWarm export") {
    Seq("unsaferow", "avro").foreach { enc =>
      withSQLConf(
        "spark.sql.streaming.stateStore.providerClass"
          -> Frontier.RocksDbProvider,
        "spark.sql.streaming.stateStore.encodingFormat" -> enc) {
        implicit val sqlCtx = spark.sqlContext
        val ckpt =
          java.nio.file.Files.createTempDirectory(s"sse_list_$enc").toString
        val in = MemoryStream[(String, Timestamp)]
        val src = in.toDF().toDF("key", "ts").withWatermark("ts", "1 second")
        val qA = graft.streaming.TwsSessions
          .sessions(src, "key", "ts", gapSeconds = 10)
          .writeStream.outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: Dataset[graft.streaming.TwsSessions.Session], _: Long) =>
              b.count(); ()
          }.start()
        in.addData(("k", ts("2024-01-01 00:00:00"))); qA.processAllAvailable()
        qA.stop()

        in.addData(("k", ts("2024-01-01 00:00:05")))
        val ex = intercept[Exception] {
          val qB = src.as[(String, Timestamp)].groupByKey(_._1)
            .transformWithState(new SessionProcessorV2(10000L),
              TimeMode.EventTime(), OutputMode.Append())
            .writeStream.outputMode(OutputMode.Append)
            .option("checkpointLocation", ckpt)
            .foreachBatch {
              (_: Dataset[graft.streaming.TwsSessions.Session], _: Long) => ()
            }.start()
          qB.processAllAvailable()
          qB.stop()
        }
        val all = messages(ex).mkString(" | ").toLowerCase
        assert(all.contains("schema"),
          s"[$enc] the widened list element must fail loudly, got: $all")
      }
    }
  }

  test("TWS MapState (the MG counters): widening the map VALUE type " +
    "fails the restart loudly under the default encoding — the migration " +
    "path is the heavyHittersWarm export") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("sse_map").toString
      val in = MemoryStream[(String, String)]
      val src = in.toDF().toDF("key", "item")
      val qA = graft.streaming.StreamHeavyHitters
        .heavyHitters(src, "key", "item", capacity = 4)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: Dataset[graft.streaming.StreamHeavyHitters.Hit], _: Long) =>
            b.count(); ()
        }.start()
      in.addData(("k", "a")); qA.processAllAvailable()
      qA.stop()

      in.addData(("k", "b"))
      val ex = intercept[Exception] {
        val qB = src.as[(String, String)].groupByKey(_._1)
          .transformWithState(new MgProcessorV2(4),
            TimeMode.None(), OutputMode.Update())
          .writeStream.outputMode(OutputMode.Update)
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: Dataset[graft.streaming.StreamHeavyHitters.Hit], _: Long) =>
              b.count(); ()
          }.start()
        qB.processAllAvailable()
        qB.stop()
      }
      val all = messages(ex).mkString(" | ").toLowerCase
      assert(all.contains("schema"),
        s"the widened map value must fail loudly, got: $all")
    }
  }

  test("flatMapGroupsWithState (the budget-processor API, default HDFS " +
    "store): a GroupState that gained a field fails the restart loudly — " +
    "the schema compatibility check covers the fMGWS surface too") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("sse_fmgws").toString
    val in = MemoryStream[(String, Long)]

    def v1(ds: Dataset[(String, Long)]) =
      ds.groupByKey(_._1).mapGroupsWithState[FmgwsV1, (String, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[FmgwsV1]) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + rows.size
          state.update(FmgwsV1(n)); (key, n)
      }
    def v2(ds: Dataset[(String, Long)]) =
      ds.groupByKey(_._1).mapGroupsWithState[FmgwsV2, (String, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[FmgwsV2]) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + rows.size
          state.update(FmgwsV2(n, None)); (key, n)
      }

    val qA = v1(in.toDS()).writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[(String, Long)], _: Long) =>
        b.count(); () }.start()
    in.addData(("k", 1L)); qA.processAllAvailable()
    qA.stop()

    in.addData(("k", 2L))
    val ex = intercept[Exception] {
      val qB = v2(in.toDS()).writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[(String, Long)], _: Long) =>
        b.count(); () }.start()
      qB.processAllAvailable()
      qB.stop()
    }
    val all = messages(ex).mkString(" | ").toLowerCase
    assert(all.contains("schema"),
      s"the widened GroupState must fail loudly, got: $all")
  }

  test("stream-stream join (symmetric hash): widening one side's row " +
    "schema against a live checkpoint fails LOUDLY on the first batch " +
    "that touches the widened store — and avro (the only evolving " +
    "encoding) is refused for joins at query start, so checkpoint-copy " +
    "is the ONLY migration (join state is not reconstructible from " +
    "emissions)") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val ckpt =
        java.nio.file.Files.createTempDirectory("sse_ssj").toString
      val imps = MemoryStream[Imp]
      val impsV2 = MemoryStream[ImpV2]
      val clicks = MemoryStream[Click]
      def run(impDf: org.apache.spark.sql.DataFrame) = graft.streaming
        .StreamJoin.attributeClicks(impDf, clicks.toDF(),
          "ik", "ck", "its", "cts", "10 seconds", 60)
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.count(); () }.start()

      val qA = run(imps.toDF())
      imps.addData(Imp("k", ts("2024-01-01 00:00:00")))
      clicks.addData(Click("k", ts("2024-01-01 00:00:30")))
      qA.processAllAvailable()
      qA.stop()

      // the restart itself does NOT fail — the value-schema check runs
      // when a batch opens the store. A click that must probe the
      // V1-buffered impression through the widened reader forces it.
      clicks.addData(Click("k", ts("2024-01-01 00:00:50")))
      val ex = intercept[Exception] {
        val qB = run(impsV2.toDF())
        qB.processAllAvailable()
        qB.stop()
      }
      val all = messages(ex).mkString(" | ")
      assert(all.contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE"),
        s"widened join input must fail the batch loudly, got: $all")
    }
    // avro — the one encoding that can evolve a ValueState field — is
    // statically REFUSED for the join operator, so no in-place evolution
    // path exists at all: unsaferow + loud failure is the complete policy
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider,
      "spark.sql.streaming.stateStore.encodingFormat" -> "avro") {
      implicit val sqlCtx = spark.sqlContext
      val imps = MemoryStream[Imp]
      val clicks = MemoryStream[Click]
      val ex = intercept[Exception] {
        val q = graft.streaming.StreamJoin.attributeClicks(
          imps.toDF(), clicks.toDF(), "ik", "ck", "its", "cts",
          "10 seconds", 60)
          .writeStream.outputMode(OutputMode.Append)
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("sse_ssj_avro").toString)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.count(); () }.start()
        q.processAllAvailable()
        q.stop()
      }
      val all = messages(ex).mkString(" | ").toLowerCase
      assert(all.contains("avro") && all.contains("not supported"),
        s"avro encoding must be refused for the join operator, got: $all")
    }
  }
}
