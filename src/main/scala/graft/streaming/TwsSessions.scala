package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** Session windows as a `transformWithState` StatefulProcessor — the
  * EMIT-ON-CLOSE form of [[graft.ext.EventWindows.session]]'s built-in
  * `session_window` aggregation, and the operator that exercises the two
  * TWS mechanisms the other processors don't: ListState (the budget and
  * leaderboard keep one ValueState row per key; a session must buffer its
  * member event TIMES) and an OUTPUT-PRODUCING timer
  * ([[CrawlBudget.BudgetProcessor]]'s timer only clears state — here the
  * expiry IS an emission point, the "key went quiet" callback a
  * production sessionizer is built on).
  *
  * Semantics match `session_window(ts, gap)` exactly: a session is a
  * maximal run of same-key events where consecutive gaps are ≤ `gap`
  * (the built-in's merge rule is "new start ≤ existing end", so an
  * exact-gap successor MERGES — locked against the built-in in spec);
  * start = first event time, end = last event time + gap.
  *
  * A session is CLOSED once the watermark reaches its end — no future
  * on-time event can merge with it (a non-late arrival has
  * ts ≥ watermark ≥ last + gap; the boundary ts = last + gap case is
  * safe because a micro-batch processes input rows BEFORE expired
  * timers, so the merge lands and re-arms the close before it could
  * fire). Closure happens on BOTH paths:
  *
  *   - input path: each batch first emits and evicts every buffered
  *     session the watermark has passed — so a CONTINUOUSLY ACTIVE key
  *     drains its closed sessions batch by batch and its buffer holds
  *     only the watermark horizon (the first implementation closed on
  *     the timer alone, which a steadily-arriving key re-arms forever:
  *     its state grew without bound and nothing ever emitted — caught
  *     in review, locked by spec);
  *   - timer path: the close timer sits at (max buffered + gap) clamped
  *     above the watermark, and covers the key that goes QUIET — no
  *     further input means no input-path close; expiry emits every
  *     buffered session and clears the key's state.
  *
  * Emission is exactly-once per session (append semantics), the same
  * close discipline the built-in aggregation gets from its watermark.
  * The min/max trackers keep the common no-close batch O(batch): the
  * full buffer is only scanned when the watermark has actually passed
  * the earliest possible close point. Requires the RocksDB state store
  * provider (the TWS contract).
  *
  * STATE-SCHEMA MIGRATION POLICY: the buffer element is a bare Long —
  * any widening (e.g. carrying a weight per event) is a TYPE change the
  * engine rejects loudly at restart under every encoding
  * (StateSchemaEvolutionSpec). Migrate by handoff, not checkpoint:
  * [[exportSeeds]] over the retained event history at the old query's
  * final watermark, then [[sessionsWarm]] on the new shape. */
object TwsSessions {

  case class Session(key: String, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** One key's exportable state: the event times of its OPEN (not yet
    * emitted) sessions. [[exportSeeds]] derives these from a batch event
    * history; [[sessionsWarm]] seeds a fresh query from them. */
  case class SessionSeed(key: String, event_times: Seq[Long])

  /** The session algorithm, shared verbatim by the cold
    * ([[SessionProcessor]]) and warm-start ([[SessionProcessorWithInit]])
    * forms — one implementation, two operator APIs, so the warm-start
    * migration cannot drift (the foldGroup pattern from
    * [[DecayedLeaderboard]]). */
  private[streaming] trait SessionCore {
    self: StatefulProcessor[String, (String, Timestamp), Session] =>
    protected def gapMs: Long
    @transient protected var buf: ListState[Long] = _
    // running min/max of the buffer: max re-arms the close timer O(batch);
    // min gates the input-path close scan (skip the buffer read entirely
    // while watermark < earliest + gap — the common case)
    @transient protected var maxTs: ValueState[Long] = _
    @transient protected var minTs: ValueState[Long] = _

    protected def openStates(): Unit = {
      buf = getHandle.getListState[Long]("event_times",
        Encoders.scalaLong, TTLConfig.NONE)
      maxTs = getHandle.getValueState[Long]("max_ts",
        Encoders.scalaLong, TTLConfig.NONE)
      minTs = getHandle.getValueState[Long]("min_ts",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Split the sorted buffer at gaps STRICTLY greater than gapMs —
      * session_window's merge rule is "new start <= existing end", so an
      * exact-gap successor MERGES (verified against the built-in
      * aggregation in TwsSessionsSpec). */
    protected def split(key: String, times: Seq[Long]): Seq[Session] = {
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
      sessions.result()
    }

    protected def onRows(key: String,
        rows: Iterator[(String, Timestamp)],
        timerValues: TimerValues): Iterator[Session] = {
      var mx = if (maxTs.exists()) maxTs.get() else Long.MinValue
      var mn = if (minTs.exists()) minTs.get() else Long.MaxValue
      rows.foreach { r =>
        val t = r._2.getTime
        buf.appendValue(t)
        if (t > mx) mx = t
        if (t < mn) mn = t
      }
      val wm = timerValues.getCurrentWatermarkInMs()
      // input-path close: emit every session the watermark already passed,
      // keep the open tail. The tail CAN be empty: late-row admission uses
      // the PREVIOUS batch's watermark while timerValues carries the
      // CURRENT (eviction) one, so when the watermark advances more than
      // gap between micro-batches (bursty source, backlog catch-up) an
      // accepted event's session may already end at or below wm — then
      // everything is closed and the key drains completely.
      var drained = false
      val closed: Seq[Session] =
        if (mn + gapMs <= wm) {
          val sortedTimes = buf.get().toSeq.sorted
          // session ends are strictly increasing, so the closed set is a
          // PREFIX and `open` keeps the order
          val (done, open) =
            split(key, sortedTimes).partition(_.session_end.getTime <= wm)
          if (open.isEmpty) {
            buf.clear(); maxTs.clear(); minTs.clear()
            drained = true
          } else if (done.nonEmpty) {
            val keepTimes =
              sortedTimes.dropWhile(_ < open.head.session_start.getTime)
            buf.clear()
            keepTimes.foreach(buf.appendValue)
            mn = keepTimes.head
          }
          done
        } else Seq.empty
      // one live close timer per key at (max buffered + gap); the clamp
      // above the current watermark keeps a timer that would already have
      // expired schedulable (the BudgetProcessor clamp). A fully drained
      // key keeps no state and no timer.
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      if (!drained) {
        maxTs.update(mx)
        minTs.update(mn)
        getHandle.registerTimer(math.max(mx + gapMs, wm + 1))
      }
      closed.iterator
    }

    protected def onTimer(key: String): Iterator[Session] = {
      val times = buf.get().toSeq.sorted
      buf.clear()
      maxTs.clear()
      minTs.clear()
      if (times.isEmpty) Iterator.empty
      else split(key, times).iterator
    }

    /** Warm-start seeding: load an exported open-buffer and arm its close
      * timer, exactly the state an uninterrupted query would hold. */
    protected def seed(seed: SessionSeed, timerValues: TimerValues): Unit =
      if (seed.event_times.nonEmpty) {
        seed.event_times.foreach(buf.appendValue)
        maxTs.update(seed.event_times.max)
        minTs.update(seed.event_times.min)
        getHandle.registerTimer(math.max(seed.event_times.max + gapMs,
          timerValues.getCurrentWatermarkInMs() + 1))
      }
  }

  class SessionProcessor(val gapMs: Long)
      extends StatefulProcessor[String, (String, Timestamp), Session]
      with SessionCore {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      openStates()
    override def handleInputRows(key: String,
        rows: Iterator[(String, Timestamp)],
        timerValues: TimerValues): Iterator[Session] =
      onRows(key, rows, timerValues)
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      onTimer(key)
  }

  /** [[SessionProcessor]] with a WARM START: `handleInitialState` seeds a
    * key's open buffer (and arms its close timer) before the first
    * micro-batch touches it. Unlike the leaderboard, a sessionizer's state
    * is NOT its emissions (open buffers are precisely what was never
    * emitted) — the export comes from [[exportSeeds]] over the
    * predecessor's event history instead, the batch→streaming handoff. */
  class SessionProcessorWithInit(val gapMs: Long)
      extends StatefulProcessorWithInitialState[String, (String, Timestamp),
        Session, SessionSeed]
      with SessionCore {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      openStates()
    override def handleInitialState(key: String, initial: SessionSeed,
        timerValues: TimerValues): Unit =
      seed(initial, timerValues)
    override def handleInputRows(key: String,
        rows: Iterator[(String, Timestamp)],
        timerValues: TimerValues): Iterator[Session] =
      onRows(key, rows, timerValues)
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      onTimer(key)
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

  /** [[sessions]] WARM-STARTED from exported open buffers: the
    * batch→streaming (or cluster-migration) handoff without a checkpoint
    * copy. The handoff contract: the predecessor has emitted exactly the
    * sessions closed as of watermark W (a batch job: the complete-history
    * sessions with `session_end <= W`); `initial` = [[exportSeeds]] of the
    * history at W. The successor then emits exactly the REMAINING sessions
    * — including sessions that span the handoff (seeded times merge with
    * new arrivals inside the gap) and seeded keys never touched again
    * (closed by the timer armed at seeding) — so predecessor ∪ successor
    * emissions equal a query that saw the whole history (locked by
    * WarmStartSpec). */
  def sessionsWarm(events: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Int,
                   initial: Dataset[SessionSeed]): Dataset[Session] = {
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(tsCol).as("ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessorWithInit(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append(),
        initial.filter(_.event_times.nonEmpty).groupByKey(_.key))
  }

  /** The OPEN session buffers of a batch event history as of watermark
    * `asOfMs`: per key, the event times of every session whose end
    * (last + gap) is still above `asOfMs` — exactly the state an
    * uninterrupted streaming query at watermark `asOfMs` would hold, and
    * the `initial` input of [[sessionsWarm]]. Session ends are increasing,
    * so the open set is the buffer's TAIL: the per-key work is one sort +
    * one scan, distributed by key (`mapGroups`). Feed a BOUNDED history
    * slice (events newer than `asOfMs` minus the longest session span you
    * retain) — closed-prefix events are dropped here anyway. */
  def exportSeeds(events: DataFrame, keyCol: String, tsCol: String,
                  gapSeconds: Int, asOfMs: Long): Dataset[SessionSeed] = {
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    val gapMs = gapSeconds * 1000L
    val spark = events.sparkSession
    import spark.implicits._
    events.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), col(tsCol).as("ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val times = it.map(_._2.getTime).toArray.sorted
        // keepFrom = first event of the first OPEN session (end > asOfMs);
        // every strictly-greater-than-gap boundary before it whose session
        // already closed advances the cut
        var keepFrom = 0
        var i = 1
        while (i <= times.length) {
          val boundary = i == times.length || times(i) - times(i - 1) > gapMs
          if (boundary && times(i - 1) + gapMs <= asOfMs) keepFrom = i
          i += 1
        }
        SessionSeed(k, times.drop(keepFrom).toSeq)
      }
      .filter(_.event_times.nonEmpty)
  }
}
