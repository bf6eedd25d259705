package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram sketch — the quantile member of the
  * [[IncrementalAgg]] family. Quantiles are not a monoid (you cannot merge
  * two medians), so incremental quantile maintenance needs a sketch whose
  * STATE is mergeable and whose estimate is derived only at read time.
  * The fixed-bin histogram is the simplest such sketch: state is per-key
  * (bin, count) rows over a caller-declared [lo, hi) domain, merge is
  * union + count sum (exactly [[IncrementalAgg.merge]]'s shape), and the
  * quantile estimate interpolates linearly inside the covering bin.
  *
  * Estimation error is bounded by one bin width — declared, not
  * data-dependent; callers that cannot bound the domain should use
  * `approx_percentile` (a GK sketch) instead, which this operator
  * complements rather than replaces: histogram state is engine-portable
  * (plain (bin, n) rows any system can produce, store, and merge — the
  * same reason [[graft.ext.SketchOps]] uses md5 count-min counters), GK
  * state is not.
  *
  * Invariant (locked by spec and oracle): for any split of the input,
  * {{{ quantiles(merge(state(a), state(b))) == quantiles(state(a ∪ b)) }}}
  *
  * Out-of-domain values clamp into the edge bins (count toward rank,
  * estimate saturates at the domain edge); null values contribute no row.
  */
object HistogramSketch {

  /** Aggregate a batch to per-key (bin, n) state. One partial-aggregated
    * shuffle on (keys, bin) — at most keys × nBins rows leave the map
    * side whatever the row count. */
  def state(df: DataFrame, keys: Seq[String], value: Column,
            lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    require(lo < hi, s"empty domain [$lo, $hi)")
    val width = (hi - lo) / nBins
    val bin = least(greatest(
      floor((value - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(nBins.toLong - 1))
    df.where(value.isNotNull)
      .groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge state tables: union + count sum on (keys, bin). Each side is
    * key×bin-cardinality, never row-cardinality. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy((keys :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Derive quantile estimates from state: per requested q in (0, 1], the
    * value at continuous rank q·n — linear interpolation inside the first
    * bin whose cumulative count reaches the rank. Two window functions
    * (cumulative + total) share ONE (keys) exchange; the final per-key
    * aggregate reuses the same partitioning. Estimates round to 4 dp
    * (house rule). */
  def quantiles(st: DataFrame, keys: Seq[String],
                lo: Double, hi: Double, nBins: Int,
                qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val width = (hi - lo) / nBins
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bin").asc)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val cum = st
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__before", col("__cum") - col("n"))
    val estimates = qs.map { q =>
      val pos = lit(q) * col("__tot")
      // the covering bin: the unique one with before < pos <= cum
      // (pos > 0 because q > 0 and empty keys produce no state rows)
      max(when(col("__before") < pos && pos <= col("__cum"),
        round(lit(lo) + lit(width) *
          (col("bin") + (pos - col("__before")) / col("n")), 4)))
        .as(s"p${(q * 100).round}")
    }
    cum.groupBy(keys.map(col): _*).agg(estimates.head, estimates.tail: _*)
  }
}
