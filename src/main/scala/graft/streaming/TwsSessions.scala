package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Session windows as a `transformWithState` StatefulProcessor — the
  * EMIT-ON-TIMER form of [[graft.ext.EventWindows.session]]'s built-in
  * `session_window` aggregation, and the operator that exercises the two
  * TWS mechanisms the other processors don't: ListState (the budget and
  * leaderboard keep one ValueState row per key; a session must buffer its
  * member event TIMES) and an OUTPUT-PRODUCING timer
  * ([[CrawlBudget.BudgetProcessor]]'s timer only clears state — here the
  * expiry IS the emission point, the "key went quiet" callback a
  * production sessionizer is built on).
  *
  * Semantics match `session_window(ts, gap)` exactly: a session is a
  * maximal run of same-key events where consecutive gaps are ≤ `gap`
  * (the built-in's merge rule is "new start ≤ existing end", so an
  * exact-gap successor MERGES — locked against the built-in in spec);
  * start = first event time, end = last event time + gap. A key's close
  * timer always sits at (max buffered time + gap) clamped above the
  * watermark; when the watermark passes it, no future on-time event can
  * merge with anything buffered (a non-late arrival has ts ≥ watermark ≥
  * last + gap, and the boundary ts = last + gap case is safe because a
  * micro-batch processes input rows BEFORE expired timers — the merge
  * lands and re-arms the timer before the close could fire), so the
  * expiry emits EVERY buffered session at once and clears the buffer.
  * Emission is therefore exactly-once per session (append semantics),
  * the same close discipline the built-in aggregation gets from its
  * watermark.
  *
  * State per key: the buffered event times of the OPEN sessions only —
  * cleared wholesale at each close, so state is bounded by the watermark
  * horizon exactly like the built-in operator, plus one timer per live
  * key. Requires the RocksDB state store provider (the TWS contract). */
object TwsSessions {

  case class Session(key: String, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, Timestamp), Session] {
    @transient private var buf: ListState[Long] = _
    // running max of the buffer, so re-arming the close timer is O(batch)
    // per batch instead of a full buffer scan (long sessions stay cheap)
    @transient private var maxTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Long]("event_times",
        Encoders.scalaLong, TTLConfig.NONE)
      maxTs = getHandle.getValueState[Long]("max_ts",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String,
        rows: Iterator[(String, Timestamp)],
        timerValues: TimerValues): Iterator[Session] = {
      var mx = if (maxTs.exists()) maxTs.get() else Long.MinValue
      rows.foreach { r =>
        val t = r._2.getTime
        buf.appendValue(t)
        if (t > mx) mx = t
      }
      maxTs.update(mx)
      // one live close timer per key at (max buffered + gap); the clamp
      // above the current watermark keeps a timer that would already have
      // expired schedulable (the BudgetProcessor clamp)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(math.max(mx + gapMs,
        timerValues.getCurrentWatermarkInMs() + 1))
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val times = buf.get().toSeq.sorted
      buf.clear()
      maxTs.clear()
      if (times.isEmpty) Iterator.empty
      else {
        // split the buffer at gaps STRICTLY greater than gapMs —
        // session_window's merge rule is "new start <= existing end", so
        // an exact-gap successor MERGES (verified against the built-in
        // aggregation in TwsSessionsSpec)
        val sessions = Seq.newBuilder[Session]
        var start = times.head; var last = times.head; var n = 1L
        times.tail.foreach { t =>
          if (t - last > gapMs) {
            sessions += Session(key, new Timestamp(start),
              new Timestamp(last + gapMs), n)
            start = t; n = 0L
          }
          last = t; n += 1
        }
        sessions += Session(key, new Timestamp(start),
          new Timestamp(last + gapMs), n)
        sessions.result().iterator
      }
    }
  }

  /** Sessionize `events` by `keyCol` with `gapSeconds`, emitting each
    * closed session once. `tsCol` must be a timestamp already carrying a
    * watermark (define it at the source); `keyCol` must be a string. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapSeconds: Int): Dataset[Session] = {
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(tsCol).as("ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
