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

  /** Per-key ordinary-least-squares trend from MERGEABLE sums — the
    * regression member of this family. State is (n, Σx, Σy, Σxx, Σxy)
    * per key (a commutative monoid: merge by addition, exactly like
    * [[state]]/[[merge]]), so a 100 TB metric's slope updates per batch
    * without history replay. Finalize:
    * slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), intercept = ȳ − slope·x̄.
    *
    * The x column is caller-supplied (typically event time as epoch
    * seconds RE-BASED near zero — e.g. minus a fixed corpus epoch): the
    * sums-based normal equation is the price of mergeability and
    * cancellation-prone when x ≫ spread(x), the same trade [[finalize]]
    * documents for sd. Keys with zero x-variance (or n < 2) get null
    * slope/intercept. Rounded to 4 dp (house rule). */
  def trendState(df: DataFrame, keys: Seq[String], x: Column,
                 y: Column): DataFrame = {
    val both = x.isNotNull && y.isNotNull
    val xv = when(both, x).cast("double")
    val yv = when(both, y).cast("double")
    df.groupBy(keys.map(col): _*).agg(
      count(xv).as("n"),
      sum(xv).as("sum_x"),
      sum(yv).as("sum_y"),
      sum(xv * xv).as("sum_xx"),
      sum(xv * yv).as("sum_xy"))
  }

  /** Merge trend states: union + component-wise sum. */
  def trendMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_x")).as("sum_x"),
      sum(col("sum_y")).as("sum_y"),
      sum(col("sum_xx")).as("sum_xx"),
      sum(col("sum_xy")).as("sum_xy"))

  /** Slope/intercept from trend state. */
  def trendFinalize(st: DataFrame, keys: Seq[String]): DataFrame = {
    val det = col("n") * col("sum_xx") - col("sum_x") * col("sum_x")
    val slope = (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) / det
    st.select((keys.map(col) ++ Seq(
      col("n"),
      when(col("n") > 1 && det =!= 0, round(slope, 4)).as("slope"),
      when(col("n") > 1 && det =!= 0,
        round((col("sum_y") - slope * col("sum_x")) / col("n"), 4))
        .as("intercept"))): _*)
  }

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
