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
}
