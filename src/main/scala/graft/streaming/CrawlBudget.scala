package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-host crawl-budget admission — the POLITENESS half of the
  * web-corpus family ([[graft.ext.WebOps.hostStats]] is the accounting
  * half): a crawl frontier must not fetch a host more than `maxPerWindow`
  * times per `windowSeconds` of event time, however many of its URLs the
  * dedup lets through. Emits EVERY input fetch tagged `admitted`
  * true/false, so the scheduler keeps the deferral signal instead of
  * silently losing work.
  *
  * This is a genuine custom-state shape — no built-in streaming operator
  * expresses "at most N per key per window with an in-order admission
  * cut" (a windowed count can't say WHICH rows made the cut, and
  * streaming has no per-key row_number) — so it runs as
  * `flatMapGroupsWithState` keyed by host:
  *
  *   - state per host = (current window start, admissions in it) — two
  *     longs, NOT the seen URLs (dedup is [[StreamDedup.urlDedup]]'s job
  *     upstream), so state is O(live hosts) however hot the crawl;
  *   - admission order within a batch is (ts, url) ascending —
  *     deterministic under any partitioning (the md5-everywhere house
  *     rule's streaming analogue);
  *   - a fetch in a LATER window resets the counter; a fetch from an
  *     already-LAPSED window (late, inside the watermark) is denied with
  *     `n_in_window = -1` — politeness can't be applied retroactively;
  *   - event-time timeout at the window end (clamped above the current
  *     watermark) removes idle hosts' state — eviction proven by a
  *     fresh-budget re-admission in the spec, the dropDuplicates
  *     contract's custom-state analogue.
  *
  * Input URLs should already be canonical ([[graft.ext.WebOps
  * .canonicalized]]): admission is per HOST, and the host of a
  * non-canonical spelling may differ by case/port.
  *
  * Memory bound: a hot host's micro-batch fetches do NOT buffer in the
  * task. [[admitGroup]] keeps a bounded selection — the `maxPerWindow`
  * sort-smallest (ts, url) rows PER EVENT-TIME WINDOW touched by the
  * batch (a max-heap per window) — and every row that overflows the
  * selection is emitted as a denial IMMEDIATELY and lazily through the
  * output iterator. The overflow emission is exact, not approximate: an
  * evicted row has, at eviction time, `maxPerWindow` batch rows of the
  * same window strictly smaller in (ts, url) order, so the sequential
  * replay is guaranteed to find that window's budget exhausted when it
  * reaches the row (`n_in_window = maxPerWindow`), or to find the window
  * lapsed (`-1`) when it predates the carried state's window. Buffered
  * rows per (host, batch) are therefore at most
  * `windows-touched-by-the-batch × maxPerWindow` — independent of how
  * many fetches the host saw — and final state is identical because
  * denied rows never mutate state. CrawlBudgetSpec floods one host and
  * proves the bound with an instrumented probe. */
object CrawlBudget {

  case class BudgetState(windowStart: Long, admitted: Int)

  case class Admission(host: String, url: String, ts: Timestamp,
                       admitted: Boolean, n_in_window: Int)

  /** [[Admission]] with an opaque payload (the fetched document, a
    * serialized metadata blob) riding along — the form
    * [[Frontier.crawlFrontier]] composes, so admission does not force a
    * re-join to recover the page body. */
  case class DocAdmission(host: String, url: String, ts: Timestamp,
                          admitted: Boolean, n_in_window: Int,
                          payload: String)

  /** One host-group's admission pass: bounded selection + lazy overflow
    * denials, then the sequential replay over the kept rows only.
    *
    * `commit` receives the final [[BudgetState]] once the kept rows are
    * replayed (after every overflow denial has been yielded); the
    * production caller maps it to `state.update` + timeout, the spec
    * captures it directly. `bufferProbe`, when non-null, observes the
    * kept-row count after each input row — spec instrumentation for the
    * memory bound, zero-cost (null check) in production. The payload never
    * influences a VERDICT — it enters the ordering only as the last
    * tie-break, reachable solely when two rows collide on (ts, url). */
  private[graft] def admitGroup(
      host: String,
      rows: Iterator[(String, String, Timestamp, String)],
      st0: Option[BudgetState],
      winMs: Long,
      maxPerWindow: Int,
      commit: BudgetState => Unit,
      bufferProbe: Int => Unit = null): Iterator[DocAdmission] = {
    val w0 = st0.map(_.windowStart).getOrElse(Long.MinValue)
    // admission order is (millis, url) — identical to the former
    // rows.toSeq.sortBy(r => (r._3.getTime, r._2)); the Timestamp rides
    // along so emitted rows keep any sub-millisecond component. The
    // payload is the FINAL tie-break (null first): verdicts depend only
    // on (ts, url), but when two same-host rows collide on both — legal
    // input here, though [[Frontier.crawlFrontier]]'s upstream urlDedup
    // makes it impossible there — heap order would otherwise decide
    // nondeterministically WHICH payload rides the kept row vs the
    // denial. A total order keeps payload attribution deterministic too.
    val ord = Ordering.by[(Long, String, Timestamp, String),
        (Long, String, Boolean, String)](
      t => (t._1, t._2, t._4 != null, if (t._4 == null) "" else t._4))
    val heaps = mutable.LongMap.empty[
      mutable.PriorityQueue[(Long, String, Timestamp, String)]]
    var kept = 0
    // Pass over the input: per window keep the maxPerWindow smallest
    // (ts, url); a row evicted from the selection already has
    // maxPerWindow same-window rows ahead of it this batch, so its
    // denial row is fully determined here and streams straight out.
    val overflow: Iterator[DocAdmission] = rows.flatMap {
      case (_, url, ts, payload) =>
        val tsMs = ts.getTime
        val w = Math.floorDiv(tsMs, winMs) * winMs
        val pq = heaps.getOrElseUpdate(w,
          mutable.PriorityQueue.empty[(Long, String, Timestamp, String)](ord))
        pq.enqueue((tsMs, url, ts, payload))
        val out = if (pq.size > maxPerWindow) {
          val (_, eurl, ets, epay) = pq.dequeue() // sort-largest kept so far
          Some(DocAdmission(host, eurl, ets, admitted = false,
            n_in_window = if (w < w0) -1 else maxPerWindow, epay))
        } else { kept += 1; None }
        if (bufferProbe ne null) bufferProbe(kept)
        out
    }
    // Replay runs only once `overflow` is exhausted (Iterator.++ is
    // by-name), i.e. once the selection is final.
    def replay(): Iterator[DocAdmission] = {
      val keptRows = heaps.iterator.flatMap(_._2.iterator).toArray.sorted(ord)
      var st = st0.getOrElse(BudgetState(Long.MinValue, 0))
      val out = keptRows.map { case (tsMs, url, ts, payload) =>
        val w = Math.floorDiv(tsMs, winMs) * winMs
        if (w > st.windowStart) st = BudgetState(w, 0)
        if (w < st.windowStart) {
          DocAdmission(host, url, ts, admitted = false, n_in_window = -1,
            payload)
        } else if (st.admitted < maxPerWindow) {
          st = st.copy(admitted = st.admitted + 1)
          DocAdmission(host, url, ts, admitted = true, st.admitted, payload)
        } else {
          DocAdmission(host, url, ts, admitted = false, st.admitted, payload)
        }
      }
      commit(st)
      out.iterator
    }
    overflow ++ replay()
  }

  def perHostAdmit(pages: DataFrame, urlCol: String, tsCol: String,
                   watermark: String, windowSeconds: Int,
                   maxPerWindow: Int): Dataset[Admission] = {
    val spark = pages.sparkSession
    import spark.implicits._
    perHostAdmitDocs(
        pages.withColumn("__no_payload", lit(null).cast("string")),
        urlCol, tsCol, "__no_payload", watermark, windowSeconds, maxPerWindow)
      .map(d => Admission(d.host, d.url, d.ts, d.admitted, d.n_in_window))
  }

  /** [[perHostAdmit]] with `payloadCol` (string) carried through untouched
    * — the fetched body stays attached to its admission verdict, so a
    * downstream consumer ([[Frontier.crawlFrontier]]'s chunk dedup) needs
    * no stream-stream re-join. Identical admission semantics and
    * two-longs-per-host state; the payload only transits the bounded
    * per-window selection, never the persistent state. */
  def perHostAdmitDocs(pages: DataFrame, urlCol: String, tsCol: String,
                       payloadCol: String, watermark: String,
                       windowSeconds: Int,
                       maxPerWindow: Int): Dataset[DocAdmission] = {
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    require(maxPerWindow >= 1, "maxPerWindow must be >= 1")
    val spark = pages.sparkSession
    import spark.implicits._
    val winMs = windowSeconds * 1000L
    pages.where(col(urlCol).isNotNull)
      .select(graft.ext.WebOps.hostOf(col(urlCol)).as("host"),
        col(urlCol).cast("string").as("url"),
        col(tsCol).cast("timestamp").as("ts"),
        col(payloadCol).cast("string").as("payload"))
      .withWatermark("ts", watermark)
      .as[(String, String, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState, DocAdmission](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (host, rows, state: GroupState[BudgetState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else admitGroup(host, rows, state.getOption, winMs, maxPerWindow,
            commit = { st =>
              state.update(st)
              // evict once the watermark passes the window end; the clamp
              // keeps setTimeoutTimestamp legal when the window end has
              // already been overtaken
              state.setTimeoutTimestamp(
                math.max(st.windowStart + winMs,
                  state.getCurrentWatermarkMs() + 1))
            })
      }
  }

  /** The admission pass as a `transformWithState` StatefulProcessor — the
    * SAME [[admitGroup]] semantics and two-longs-per-host state, on the
    * operator API whose `eventTimeColumnName` output contract lets
    * stateful operators chain AFTER it ([[Frontier.crawlFrontier]]'s
    * whole reason to exist; `flatMapGroupsWithState` output drops the
    * event-time tag, so nothing stateful can follow it). Requires the
    * RocksDB state store provider.
    *
    * STATE-SCHEMA MIGRATION POLICY: a widened [[BudgetState]] fails the
    * restart loudly under the default encoding, on BOTH operator APIs
    * (StateSchemaEvolutionSpec pins the fMGWS path too). The budget
    * window is short-lived by construction — the cheapest migration is
    * a fresh checkpoint after a window-length quiet-down (every window
    * expires within `winMs`); avro in-place field-add is available for
    * the TWS form if zero-downtime is required. */
  class BudgetProcessor(winMs: Long, maxPerWindow: Int)
      extends StatefulProcessor[String, (String, String, Timestamp, String),
        DocAdmission] {
    @transient private var st: ValueState[BudgetState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BudgetState]("budget",
        Encoders.product[BudgetState], TTLConfig.NONE)

    override def handleInputRows(host: String,
        rows: Iterator[(String, String, Timestamp, String)],
        timerValues: TimerValues): Iterator[DocAdmission] =
      admitGroup(host, rows,
        if (st.exists()) Some(st.get()) else None, winMs, maxPerWindow,
        commit = { s =>
          st.update(s)
          // one live eviction timer per host: window end, clamped above
          // the current watermark (the fMGWS setTimeoutTimestamp clamp)
          getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
          getHandle.registerTimer(math.max(s.windowStart + winMs,
            timerValues.getCurrentWatermarkInMs() + 1))
        })

    override def handleExpiredTimer(host: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DocAdmission] = {
      st.clear()
      Iterator.empty
    }
  }

  /** [[perHostAdmitDocs]] on `transformWithState` with `tsCol`
    * re-declared as the OUTPUT event-time column, so downstream stateful
    * operators (the frontier's chunk dedup) keep a watermark to evict by.
    * The input must already carry a watermark on `tsCol` (define it once
    * at the source — Spark disallows redefinition in multi-stateful
    * queries); `urlCol`/`payloadCol` must already be strings and `tsCol`
    * a timestamp, because a cast here would strip the event-time tag the
    * chain depends on. */
  def perHostAdmitDocsTws(pages: DataFrame, urlCol: String, tsCol: String,
                          payloadCol: String, windowSeconds: Int,
                          maxPerWindow: Int): Dataset[DocAdmission] = {
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    require(maxPerWindow >= 1, "maxPerWindow must be >= 1")
    val spark = pages.sparkSession
    import spark.implicits._
    val winMs = windowSeconds * 1000L
    pages.where(col(urlCol).isNotNull)
      .select(graft.ext.WebOps.hostOf(col(urlCol)).as("host"),
        col(urlCol).as("url"), col(tsCol).as("ts"),
        col(payloadCol).as("payload"))
      .as[(String, String, Timestamp, String)]
      .groupByKey(_._1)
      .transformWithState(new BudgetProcessor(winMs, maxPerWindow),
        eventTimeColumnName = "ts", outputMode = OutputMode.Append())
  }
}
