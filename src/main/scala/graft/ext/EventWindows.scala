package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the `events` table — the capability
  * extension flagged in SURVEY.md §2.9 (the reference only has predicate
  * windows; tumbling/sliding/session windows are added here). The same
  * expressions run in batch or under Structured Streaming with a watermark.
  */
object EventWindows {

  /** Tumbling window aggregate. `window()` is Catalyst-native: the window
    * struct is computed map-side, then one shuffle on (window, keys). */
  def tumbling(events: DataFrame, ts: Column, width: String,
               keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy((window(ts, width) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Sliding window aggregate (each event contributes to width/slide
    * windows — the fan-out happens map-side before the shuffle). */
  def sliding(events: DataFrame, ts: Column, width: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy((window(ts, width, slide) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session windows with a fixed inactivity gap. `session_window` merges
    * overlapping per-key sessions; in batch Catalyst plans it as sort+merge
    * within partitions keyed by the session keys. */
  def session(events: DataFrame, ts: Column, gap: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy((session_window(ts, gap) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Row-level sessionization: assign every event its per-key session
    * ordinal (gaps-and-islands — a new session opens where the gap to the
    * previous event exceeds `gapMicros`). [[session]] gives the session
    * AGGREGATES; this keeps the rows, which is what downstream
    * feature/funnel pipelines join on.
    *
    * Shape: two windows over the same (keys; ts, tiebreak) spec — the
    * boundary flag via lag, the ordinal via a running sum — so the whole
    * op is ONE hash exchange + one sort per key group, the [[ScdMerge]]
    * pattern. `tiebreak` must make the per-key order total. */
  def sessionize(events: DataFrame, keys: Seq[Column], tsMicros: Column,
                 tiebreak: Column, gapMicros: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(tsMicros.asc, tiebreak.asc)
    // null lag (first row of a key) compares null > gap -> null -> 0: the
    // key's first session is ordinal 0
    val newSession =
      when(tsMicros - lag(tsMicros, 1).over(w) > gapMicros, 1L)
        .otherwise(lit(0L))
    events.withColumn("session_id", sum(newSession).over(w))
  }

  /** Burst/outlier detection against each key's own trailing baseline:
    * flag events whose value deviates > `zThresh` sample standard
    * deviations from the key's trailing-window mean (with ≥ `minN` events
    * of evidence and non-degenerate spread). The per-key-baseline form of
    * anomaly detection — a global z-score misses a quiet user spiking and
    * flags a loud user's normal day.
    *
    * All three rolling stats (mean, stddev, count) share ONE window spec,
    * so the whole op is one exchange + one sort per key group. The z-score
    * is rounded to 4 dp BEFORE the threshold gate (house rule: both
    * engines gate on the identical rounded value). σ = 0 (all-equal
    * window) is exactly 0.0 in any engine — the `sd > 0` guard is
    * float-safe. */
  def burstAnomalies(events: DataFrame, keys: Seq[Column], tsMicros: Column,
                     value: Column, windowMicros: Long, minN: Int,
                     zThresh: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(tsMicros.asc)
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("__mu", avg(value).over(w))
      .withColumn("__sd", stddev_samp(value).over(w))
      // count(value), not count(*): null values contribute nothing to
      // mu/sd, so they are not evidence either
      .withColumn("__n", count(value).over(w))
      .where(col("__n") >= minN && col("__sd") > 0)
      .withColumn("z", round((value - col("__mu")) / col("__sd"), 4))
      .where(abs(col("z")) > zThresh)
      .drop("__mu", "__sd", "__n")
  }

  /** Trailing time-range rolling aggregate: for each event, `agg` over the
    * key's events in [ts − windowMicros, ts] — the moving-average /
    * rate-limit / burst-detection primitive. RANGE frame on the physical
    * µs axis (Spark range frames are numeric; DuckDB's INTERVAL RANGE
    * frame is the same inclusive-bounds semantics, which is what makes
    * this oracle-checkable). One exchange, one sort; every row is
    * evaluated in one pass per key group — no self-join against the
    * window, which is the O(n·w) trap this op exists to avoid. */
  def rolling(events: DataFrame, keys: Seq[Column], tsMicros: Column,
              windowMicros: Long, agg: Column => Column,
              value: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(tsMicros.asc)
      .rangeBetween(-windowMicros, 0)
    events.withColumn("rolling", agg(value).over(w))
  }

  /** Exponentially time-decayed popularity: per key,
    * `score = Σ_events w_i · 0.5^((ref − t_i) / halfLife)` — recent events
    * count fully, events one half-life old count half. The decay weight is
    * a pure per-row column (no window, no ordering), so the whole score is
    * ONE partial-aggregated shuffle on the key — and the aggregate is a
    * monoid (a sum), so partial scores merge across batches, partitions,
    * or streaming micro-batches by addition. Re-referencing a stored score
    * to a newer `ref` is one multiplication: score · 0.5^((ref'−ref)/hl) —
    * the property that makes decayed counts THE incremental popularity
    * metric (no event replay to age a leaderboard).
    *
    * `refMicros` must be supplied by the caller (injected like
    * Broadcaster's `now`): deriving it from the data would both hide an
    * extra pass and make scores batch-relative. */
  def decayedScore(events: DataFrame, keys: Seq[Column], tsMicros: Column,
                   weight: Column, refMicros: Long,
                   halfLifeMicros: Long): DataFrame = {
    require(halfLifeMicros > 0, "halfLifeMicros must be positive")
    val decay = pow(lit(0.5),
      (lit(refMicros) - tsMicros).cast("double") / lit(halfLifeMicros.toDouble))
    events.groupBy(keys: _*)
      .agg(round(sum(weight * decay), 4).as("decayed_score"),
        count(lit(1)).as("n_events"))
  }
}
