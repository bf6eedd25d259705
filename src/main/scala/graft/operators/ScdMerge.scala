package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history over a change log, and the
  * incremental merge that keeps such a history current — the standard
  * warehouse mechanism for giving every fact row the dimension attributes
  * that were true *at its timestamp* (pairs naturally with [[AsOfJoin]],
  * which is the lookup side of the same contract).
  *
  * Scale shape: [[history]] is two windows over the SAME
  * (partitionBy keys, orderBy ts/tiebreak) spec, so the whole build is ONE
  * hash exchange + one sort per key group — no join, no self-join, no
  * driver state. [[merge]] touches only closed rows (pass-through union)
  * plus a recompute over (current rows ∪ updates), which is again a single
  * windowed pass; at 100 TB the incoming batch is tiny relative to the
  * dimension, and the recompute input is |keys| + |batch| rows, not the
  * full history.
  */
object ScdMerge {

  /** Build a type-2 history from an event log.
    *
    * Consecutive rows of a key whose `attrs` are unchanged are compacted
    * into one version (change-point detection via null-safe lag compare),
    * so replaying the same state twice does not open a new version. Each
    * surviving version carries:
    *   - `valid_from`  — the `ts` of the row that opened it,
    *   - `__open_tb`   — the `tiebreak` of that row (kept so [[merge]] can
    *                     replay the current version into a recompute with
    *                     its original sort position; select it away in
    *                     user-facing output),
    *   - `valid_to`    — the next version's `valid_from` (null ⇒ current),
    *   - `is_current`  — `valid_to IS NULL`.
    *
    * `tiebreak` must make (keys, ts, tiebreak) unique or the history is
    * nondeterministic (same contract as every keep-last dedup in this
    * repo).
    */
  def history(log: DataFrame, keys: Seq[String], ts: String,
              tiebreak: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(tiebreak).asc)
    // A version opens where any attribute differs (null-safely) from the
    // previous row of the key, or at the key's first row.
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val opens = log
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .drop("__chg")
    // The close-out window below shares `w`'s partitioning AND ordering
    // ((valid_from, __open_tb) are the renamed (ts, tiebreak)), and the
    // filter preserves the sort — so it rides the first exchange.
    opens
      .select((keys.map(col) ++ attrs.map(col) ++ Seq(
        col(ts).as("valid_from"),
        col(tiebreak).as("__open_tb"))): _*)
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keys.map(col): _*)
            .orderBy(col("valid_from").asc, col("__open_tb").asc)))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Reconstruct the dimension as it stood at instant `at`: the version
    * whose [valid_from, valid_to) interval covers it — at most one row per
    * key by construction. A pure filter (map-side, partition-prunable when
    * the history is stored partitioned on valid_from ranges); the time
    * travel read the history exists to serve. */
  def snapshotAt(dim: DataFrame, at: Column): DataFrame =
    dim.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** Merge an append batch of updates into an existing type-2 history.
    *
    * Closed versions are immutable and pass through untouched; the current
    * version of each key is replayed (at its original `valid_from` /
    * `__open_tb` sort position) together with the new rows, and
    * [[history]] recomputes that suffix — closing the current version at
    * the first genuinely-changed update, compacting updates that repeat
    * the current state, and opening keys seen for the first time.
    *
    * Invariant (locked by ScdMergeSpec and the x_scd2_merge oracle): for an
    * append-only split of a log at any cutoff,
    * {{{ merge(history(before), after) == history(before ∪ after) }}}
    *
    * Precondition: every update row of a key sorts STRICTLY after the
    * key's current version's opening position — (ts, tiebreak) >
    * (valid_from, __open_tb) — i.e. append-only CDC with monotone
    * positions. A late row at or before that position would belong inside
    * closed versions (or tie with the replayed open row and fabricate a
    * zero-width version), which this op will not rewrite — rebuild with
    * [[history]] for retro-corrections.
    */
  def merge(dim: DataFrame, updates: DataFrame, keys: Seq[String], ts: String,
            tiebreak: String, attrs: Seq[String]): DataFrame = {
    val cols = keys ++ attrs
    val closed = dim.where(!col("is_current"))
    val currentAsLog = dim.where(col("is_current"))
      .select((cols.map(col) :+ col("valid_from").as(ts)
        :+ col("__open_tb").as(tiebreak)): _*)
    val updLog = updates.select((cols :+ ts :+ tiebreak).map(col): _*)
    val recomputed =
      history(currentAsLog.unionByName(updLog), keys, ts, tiebreak, attrs)
    closed.unionByName(recomputed)
  }
}
