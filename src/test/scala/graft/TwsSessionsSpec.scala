package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.EventWindows
import graft.streaming.{Frontier, TwsSessions}
import graft.streaming.TwsSessions.Session

/** Timer-emitted TWS session windows: parity with the built-in
  * session_window aggregation, close-gating on the watermark, and
  * whole-buffer multi-session close. The checkpoint-restart case (ListState
  * + registered timer restoring) lives in RecoverySpec. */
class TwsSessionsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // two keys; k1's third event lands at EXACTLY the gap after its second —
  // the session_window merge rule ("new start <= existing end") MERGES it,
  // so k1 is ONE session of 3; k2 one single-event session
  private val events = Seq(
    ("k1", ts("2024-01-01 00:00:00")),
    ("k1", ts("2024-01-01 00:00:05")),
    ("k1", ts("2024-01-01 00:00:15")), // exactly gap(10s) after 00:00:05
    ("k2", ts("2024-01-01 00:00:03")))

  private def batchSessions(rows: Seq[(String, Timestamp)]): Set[Session] =
    EventWindows.session(rows.toDF("key", "ts"), col("ts"), "10 seconds",
        keys = Seq(col("key")), aggs = Seq(count(lit(1)).as("n")))
      .select(col("key"), col("session_start"), col("session_end"),
        col("n").as("n_events"))
      .as[Session].collect().toSet

  test("emitted sessions equal the built-in session_window aggregation, " +
    "including the exact-gap boundary (a successor at last + gap MERGES)") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Timestamp)]
      val q = TwsSessions.sessions(
          in.toDF().toDF("key", "ts").withWatermark("ts", "1 second"),
          "key", "ts", gapSeconds = 10)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_sess").start()
      in.addData(events: _*); q.processAllAvailable()
      // advance the watermark far past every close point; one more batch
      // fires the timers
      in.addData(("zz", ts("2024-01-01 02:00:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 02:00:01"))); q.processAllAvailable()
      q.stop()
      val got = spark.table("tws_sess").as[Session].collect().toSet
      assert(got === batchSessions(events),
        "timer-emitted sessions must equal the session_window aggregation")
      // the boundary case explicitly: the exact-gap event merged, one
      // 3-event session spanning to 00:00:25
      assert(got.contains(Session("k1", ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:00:25"), 3L)))
    }
  }

  test("a session emits ONLY after the watermark passes its close point — " +
    "an open session stays unemitted, a mid-gap arrival extends it") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Timestamp)]
      val q = TwsSessions.sessions(
          in.toDF().toDF("key", "ts").withWatermark("ts", "1 second"),
          "key", "ts", gapSeconds = 10)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_open").start()
      in.addData(("k", ts("2024-01-01 00:00:00"))); q.processAllAvailable()
      def emitted() = spark.table("tws_open").as[Session].collect().toSet
      assert(emitted().isEmpty, "open session must not emit")
      // a second event 8 s later (inside the gap) extends the session; the
      // watermark (driven by this event minus 1 s delay) is still before
      // the close point, so still nothing emits
      in.addData(("k", ts("2024-01-01 00:00:08"))); q.processAllAvailable()
      assert(emitted().isEmpty, "extended session is still open")
      // advance the watermark past 00:00:18; the next batch fires the timer
      in.addData(("zz", ts("2024-01-01 00:01:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 00:01:01"))); q.processAllAvailable()
      q.stop()
      val got = emitted().filter(_.key == "k")
      assert(got === Set(Session("k", ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:00:18"), 2L)),
        "the extended session must close once with both events")
    }
  }

  test("one expiry closes EVERY buffered session: two bursts of one key " +
    "arriving before any close emit as two sessions from a single timer") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Timestamp)]
      val q = TwsSessions.sessions(
          in.toDF().toDF("key", "ts").withWatermark("ts", "1 hour"),
          "key", "ts", gapSeconds = 10)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_multi").start()
      // the 1 h watermark delay keeps both bursts buffered (no close
      // between them); the timer after batch 2 sits at burst-2 end
      in.addData(("k", ts("2024-01-01 00:00:00")),
        ("k", ts("2024-01-01 00:00:04"))); q.processAllAvailable()
      in.addData(("k", ts("2024-01-01 00:05:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 06:00:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 06:00:01"))); q.processAllAvailable()
      q.stop()
      val got = spark.table("tws_multi").as[Session].collect()
        .filter(_.key == "k").toSet
      assert(got === Set(
        Session("k", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:14"), 2L),
        Session("k", ts("2024-01-01 00:05:00"), ts("2024-01-01 00:05:10"), 1L)),
        s"one timer must close both buffered sessions, got $got")
    }
  }

  test("a CONTINUOUSLY ACTIVE key drains its closed sessions on the INPUT " +
    "path, batch by batch — the timer (always re-armed ahead of a lagging " +
    "watermark) never fires, yet emissions flow and the buffer stays at " +
    "the watermark horizon (the review-caught unbounded-state case)") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Timestamp)]
      val q = TwsSessions.sessions(
          in.toDF().toDF("key", "ts").withWatermark("ts", "1 second"),
          "key", "ts", gapSeconds = 600)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_active").start()
      // one event every 15 min (> the 10 min gap): every event is its own
      // session, and the key is touched EVERY batch so handleExpiredTimer
      // can never be the emission path (each batch re-arms the timer at
      // last + gap, which always leads the 1 s-lagging watermark)
      val mins = Seq(0, 15, 30, 45, 60)
      mins.foreach { m =>
        in.addData(("k", ts(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")))
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("tws_active").as[Session].collect().toSet
      // the watermark lags one batch, so after the 01:00 batch the closed
      // prefix is the 00:00/00:15/00:30 sessions — emitted WHILE the key
      // stayed active, exactly once each
      assert(got === Set(0, 15, 30).map(m =>
        Session("k", ts(f"2024-01-01 00:$m%02d:00"),
          ts(f"2024-01-01 00:${m + 10}%02d:00"), 1L)),
        s"input-path close must drain the active key's closed sessions, got $got")
    }
  }

  test("a watermark jump LARGER than the gap between micro-batches closes " +
    "even the newest session gracefully — late-band admission uses the " +
    "previous batch's watermark while eviction uses the current one, so an " +
    "accepted event's session can already be past close in the batch that " +
    "created it (the review-caught require-crash case)") {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider,
      // a no-data batch between addData calls would advance the LATE
      // watermark too and simply drop the 10:30 row; disabling it keeps the
      // two watermarks one batch apart — the production bursty-source shape
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Timestamp)]
      val q = TwsSessions.sessions(
          in.toDF().toDF("key", "ts").withWatermark("ts", "1 second"),
          "key", "ts", gapSeconds = 10)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_jump").start()
      in.addData(("zz", ts("2024-01-01 10:00:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 12:00:00"))); q.processAllAvailable()
      // batch 3: late filter = 09:59:59 (batch-1 max − delay) ADMITS the
      // 10:30 row; TimerValues eviction watermark = 11:59:59 (batch-2 max
      // − delay) already passed its session end 10:30:10
      in.addData(("k", ts("2024-01-01 10:30:00"))); q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"query must survive the watermark jump: ${q.exception}")
      // the drained key holds no state: a later event opens a FRESH session
      in.addData(("k", ts("2024-01-01 12:30:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 14:00:00"))); q.processAllAvailable()
      in.addData(("zz", ts("2024-01-01 14:00:01"))); q.processAllAvailable()
      q.stop()
      val got = spark.table("tws_jump").as[Session].collect()
        .filter(_.key == "k").toSet
      assert(got === Set(
        Session("k", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:10"), 1L),
        Session("k", ts("2024-01-01 12:30:00"), ts("2024-01-01 12:30:10"), 1L)),
        s"the jump-closed session must emit once and leave no state, got $got")
    }
  }

  test("guards: non-positive gap") {
    intercept[IllegalArgumentException] {
      TwsSessions.sessions(Seq(("k", ts("2024-01-01 00:00:00")))
        .toDF("key", "ts"), "key", "ts", gapSeconds = 0)
    }
  }
}
