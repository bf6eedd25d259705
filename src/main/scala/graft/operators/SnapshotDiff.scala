package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot diff with per-column change classification — the
  * table-level CDC the reference's per-run checksum diff
  * (alerts-recon.py:47-58, cache diff via checksum anti-join) answers only
  * with "changed or not": given two versions of a keyed table, classify
  * every key as added / removed / changed and name WHICH columns moved.
  * The inspection surface for incremental pipelines: what exactly did the
  * upstream resend, and do we care?
  */
object SnapshotDiff {

  /** (key columns..., change_type, changed_cols, changed_cols_arr) —
    * change_type ∈ {'added','removed','changed'}; changed_cols is the
    * comma-joined list of differing compare columns in the caller's order
    * (engine-portable — a string survives any hash-compare), and
    * changed_cols_arr the same list as an array (the programmatic surface:
    * `array_contains(changed_cols_arr, 'price')` beats string matching);
    * both null for added/removed rows. Unchanged keys are absent.
    * Comparisons are null-safe (NULL → value is a change, NULL → NULL is
    * not). Keys are expected unique per snapshot (a snapshot IS a keyed
    * state); a duplicated key produces one output row per pairing, like
    * any join.
    *
    * Scale shape: ONE full-outer sort-merge join on the key (each side
    * shuffles once; co-locate via bucketed layout to eliminate both
    * exchanges — io/BucketedStore), classification entirely map-side above
    * it. No window, no collect. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    val o = oldSnap.select((keyCols ++ compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newSnap.select((keyCols ++ compareCols).map(c => col(c).as(s"__n_$c")): _*)
    val keyEq = keyCols.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _)
    val oldMissing = keyCols.map(c => col(s"__o_$c").isNull).reduce(_ && _)
    val newMissing = keyCols.map(c => col(s"__n_$c").isNull).reduce(_ && _)
    val diffs = compareCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
    val changedCols = concat_ws(",",
      compareCols.zip(diffs).map { case (c, d) =>
        when(d, lit(c)).otherwise(lit(null).cast("string"))
      }: _*)
    val changeType = when(oldMissing, "added")
      .when(newMissing, "removed")
      .when(diffs.reduce(_ || _), "changed")
    o.join(n, keyEq, "full_outer")
      .withColumn("change_type", changeType)
      .where(col("change_type").isNotNull)
      .select(keyCols.map(c =>
          coalesce(col(s"__o_$c"), col(s"__n_$c")).as(c)) ++
        Seq(col("change_type"),
          when(col("change_type") === "changed", changedCols)
            .otherwise(lit(null).cast("string")).as("changed_cols"),
          when(col("change_type") === "changed",
              split(changedCols, ","))
            .otherwise(lit(null).cast("array<string>"))
            .as("changed_cols_arr")): _*)
  }
}
