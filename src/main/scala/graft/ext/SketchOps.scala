package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch over a token/key stream — the fixed-size
  * frequency summary for heavy-hitter detection at corpus scale (Cormode &
  * Muthukrishnan 2005). The sketch is depth×width counters regardless of
  * input size; estimates are upper bounds (collisions only ever inflate),
  * with error ≤ 2n/width at ~1-(1/2)^depth confidence.
  *
  * Hashing is md5-derived (row r's bucket for key k = first 8 hex digits of
  * md5(k ":" r) mod width), so the ENTIRE sketch is reproducible on any
  * engine with md5 — the DuckDB oracle builds the identical counters, which
  * turns a normally engine-specific sketch into a hash-comparable one.
  *
  * Plan shape: one explode to depth× rows, one groupBy(row, bucket) — the
  * aggregate is partial map-side and its result is bounded by depth×width
  * rows however large the input. Estimation joins the (tiny, broadcast)
  * sketch and takes min over rows. */
object SketchOps {

  // NULL keys fail loudly: md5(concat(null, ...)) is null, so a null key
  // would land its whole mass in an unjoinable (r, NULL) bucket row —
  // breaking both the depth×width size bound and the never-undercounts
  // contract (estimate()'s join can never match NULL = NULL). The guard
  // lives inside the consumed column so pruning cannot drop it.
  private def bucket(key: Column, r: Column, width: Int): Column = {
    val k = when(key.isNotNull, key)
      .otherwise(raise_error(lit("countMin: null key")))
    conv(substring(md5(concat(k, lit(":"), r.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width
  }

  /** Build the sketch from a stream of keys (one row per OCCURRENCE).
    * Returns (r, bucket, cnt) — at most depth×width rows. */
  def countMin(keys: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    keys.select(col(keyCol),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .select(col("r"), bucket(col(keyCol), col("r"), width).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries` (distinct keys in `keyCol`): min over
    * the depth rows of each key's bucket counter. The sketch side is
    * broadcast (≤ depth×width rows by construction). A key hashing to an
    * untouched bucket estimates 0 via the left join. */
  def estimate(queries: DataFrame, keyCol: String, sketch: DataFrame,
               depth: Int, width: Int): DataFrame =
    queries.select(col(keyCol),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .select(col(keyCol), col("r"), bucket(col(keyCol), col("r"), width).as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** Per-stratum distinct counts — the cardinality half of corpus profiling
    * (count-min above is the frequency half).
    *
    * `exact = true` uses `count(distinct key)`, which shuffles the full
    * distinct key set per stratum — correct at any size but O(distinct)
    * state; it is the oracle-checkable form. `exact = false` switches to
    * `approx_count_distinct` (HyperLogLog++, Heule et al. 2013): constant
    * ~kilobytes of state per group however many distinct keys, merged
    * map-side — the 100-TB default. Its estimates are engine-specific, so
    * its correctness contract is the spec's exact-vs-approx tolerance
    * assertion, not a byte-compare (the groupStats convention). */
  def distinctCount(df: DataFrame, stratum: Column, key: Column,
                    exact: Boolean, rsd: Double = 0.05): DataFrame = {
    val dc = if (exact) count_distinct(key) else approx_count_distinct(key, rsd)
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n"), dc.as("n_distinct"))
  }

  // ---- KMV distinct sketch (mergeable, engine-portable) ----

  /** 60-bit md5-derived hash: 15 hex digits keep the value positive and
    * the digit arithmetic inside BIGINT in any engine. */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-stratum KMV state — the k smallest distinct [[hash60]] values as
    * a sorted array<long> ([[graft.functions.KmvAgg]]: k-bounded buffer,
    * map-side partial aggregation). Unlike approx_count_distinct's HLL++
    * registers, this state is EXACTLY reproducible cross-engine, so the
    * sketch itself is oracle-checkable, not just tolerance-checked. */
  def kmvState(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(graft.functions.SketchFunctions.kmv_agg(hash60(key), k).as("kmv"))

  /** Merge state frames — KMV is a monoid: union the arrays, retake the k
    * minima (one explode + the same aggregate; cross-snapshot distinct
    * counting without re-reading either corpus). */
  def kmvMerge(states: DataFrame, k: Int): DataFrame =
    states.select(col("stratum"), explode(col("kmv")).as("__h"))
      .groupBy("stratum")
      .agg(graft.functions.SketchFunctions.kmv_agg(col("__h"), k).as("kmv"))

  /** Estimate from state: fewer than k minima means the buffer saw every
    * distinct value (exact); otherwise D̂ = (k−1)·2⁶⁰/u_(k) — one double
    * division and a round, bit-identical in any engine. */
  def kmvEstimate(state: DataFrame, k: Int): DataFrame =
    state.select(col("stratum"), size(col("kmv")).as("k_used"),
      when(size(col("kmv")) < k, size(col("kmv")).cast("long"))
        .otherwise(round(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
          element_at(col("kmv"), k), 0).cast("long"))
        .as("n_distinct_est"))
}
