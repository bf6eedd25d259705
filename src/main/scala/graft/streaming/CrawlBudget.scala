package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  *   - within a batch the group sorts by (ts, url) — deterministic
  *     admission order under any partitioning (the md5-everywhere house
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
  * Memory bound: the emit-every-fetch-with-its-flag contract means one
  * micro-batch's fetches for ONE host buffer in that task (the sort that
  * makes the cut deterministic needs them anyway). PERSISTENT state
  * stays two longs per host regardless, but if a single host can exceed
  * executor memory within one micro-batch, bound the trigger interval or
  * pre-limit per (host, batch) upstream — admission past maxPerWindow is
  * denial either way. */
object CrawlBudget {

  case class BudgetState(windowStart: Long, admitted: Int)

  case class Admission(host: String, url: String, ts: Timestamp,
                       admitted: Boolean, n_in_window: Int)

  def perHostAdmit(pages: DataFrame, urlCol: String, tsCol: String,
                   watermark: String, windowSeconds: Int,
                   maxPerWindow: Int): Dataset[Admission] = {
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    require(maxPerWindow >= 1, "maxPerWindow must be >= 1")
    val spark = pages.sparkSession
    import spark.implicits._
    val winMs = windowSeconds * 1000L
    pages.where(col(urlCol).isNotNull)
      .select(graft.ext.WebOps.hostOf(col(urlCol)).as("host"),
        col(urlCol).cast("string").as("url"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[(String, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState, Admission](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (host, rows, state: GroupState[BudgetState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
            var st = state.getOption.getOrElse(BudgetState(Long.MinValue, 0))
            val out = sorted.map { case (_, url, ts) =>
              val w = Math.floorDiv(ts.getTime, winMs) * winMs
              if (w > st.windowStart) st = BudgetState(w, 0)
              if (w < st.windowStart) {
                Admission(host, url, ts, admitted = false, n_in_window = -1)
              } else if (st.admitted < maxPerWindow) {
                st = st.copy(admitted = st.admitted + 1)
                Admission(host, url, ts, admitted = true, st.admitted)
              } else {
                Admission(host, url, ts, admitted = false, st.admitted)
              }
            }
            state.update(st)
            // evict once the watermark passes the window end; the clamp
            // keeps setTimeoutTimestamp legal when the window end has
            // already been overtaken
            state.setTimeoutTimestamp(
              math.max(st.windowStart + winMs,
                state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
