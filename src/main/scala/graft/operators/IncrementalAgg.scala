package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view upkeep): keep a
  * per-key table of MERGEABLE partial-aggregate state (count / sum / min /
  * max / sum-of-squares — a commutative monoid), fold each new batch into
  * it, and derive the presentation statistics (mean, sample std) only at
  * read time. This is how a 100 TB rolling metric avoids rescanning
  * history: the daily job aggregates ONLY the new partition and merges
  * states — never raw-history + raw-batch.
  *
  * Invariant (ScdMerge's pattern, locked by IncrementalAggSpec and the
  * x_agg_merge oracle): for any split of the input,
  * {{{ finalize(merge(state(a), state(b))) == finalize(state(a ∪ b)) }}}
  *
  * Nulls contribute to no component (count(value) semantics), so an
  * all-null key has n = 0 and null mean/std — same as the direct
  * aggregate.
  */
object IncrementalAgg {

  private val comps = Seq("n", "sum_v", "min_v", "max_v", "sumsq_v")

  /** Aggregate a batch to per-key mergeable state. */
  def state(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(value).as("n"),
      sum(value).as("sum_v"),
      min(value).as("min_v"),
      max(value).as("max_v"),
      sum(value * value).as("sumsq_v"))

  /** Merge state tables (identical schemas): union + the monoid's own
    * combine. One shuffle on the keys; each side is key-cardinality, not
    * row-cardinality. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"),
      sum(col("sumsq_v")).as("sumsq_v"))

  /** Derive presentation stats from state. The sample-std uses the naive
    * sumsq identity — the price of mergeability; both engines evaluate the
    * IDENTICAL expression, so the oracle compare is stable, and at double
    * precision the cancellation is harmless for values ≪ 2^26. Keys with
    * n ≤ 1 get a null std; n = 0 (all-null key) a null mean. */
  def finalize(st: DataFrame, keys: Seq[String]): DataFrame =
    st.select((keys.map(col) ++ Seq(
      col("n"),
      round(col("sum_v") / col("n"), 4).as("mean"),
      // greatest(·, 0): float cancellation can leave the zero-variance
      // case a hair negative — sqrt would be NaN in one engine and 0.0 in
      // the other depending on summation order
      round(sqrt(greatest(
        (col("sumsq_v") - col("sum_v") * col("sum_v") / col("n")) /
          (col("n") - 1), lit(0.0))), 4).as("sd"),
      col("min_v"), col("max_v"))): _*)
      .withColumn("sd", when(col("n") > 1, col("sd")))
}
