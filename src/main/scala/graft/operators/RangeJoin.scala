package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join on a numeric axis.
  *
  * The declarative formulation — `points.join(intervals, pt >= start &&
  * pt < end)` — has no equi-conjunct, so Spark plans a broadcast/cartesian
  * nested-loop: every point is tested against every interval,
  * O(|points| × |intervals|). Fine for a broadcast-tiny interval table,
  * fatal when both sides scale (the classic sensor-readings ×
  * maintenance-windows or attribution-window join).
  *
  * This operator restores an equi-join: pick a `bucketWidth` on the axis,
  * explode each interval over the buckets it covers, map each point to its
  * one containing bucket, equi-join on (keys…, bucket), then apply the
  * exact containment predicate. A point's bucket is unique, so every
  * qualifying (point, interval) pair meets in EXACTLY one bucket — no
  * dedup pass. The expansion factor is ⌈interval span / bucketWidth⌉,
  * chosen by the caller to trade shuffle volume against bucket selectivity
  * (a width near the median interval span keeps it ≤ 2).
  *
  * Scale properties: both sides shuffle hash-partitioned on
  * (keys…, bucket) — co-located, AQE-skew-rescuable, no nested loop
  * anywhere (locked by PlanSpec). The per-interval explosion is guarded by
  * `maxBucketsPerInterval` with an unprunable `raise_error` riding the
  * join key — a degenerate interval (end ≈ +∞ from a dirty parse) would
  * otherwise silently regenerate the cross join this operator exists to
  * kill.
  *
  * Axis convention: the axis columns are NUMERIC (long). Timestamp
  * callers convert with `unix_micros` (lossless for parquet µs data) —
  * keeping the operator agnostic lets the same code serve time, numeric
  * ranges (IP blocks, genomic coordinates), and anything totally ordered.
  * Intervals are half-open [start, end); rows with null axis values or
  * null keys drop (inner-join semantics). `points` and `intervals` must
  * not share column names besides `keys`.
  */
object RangeJoin {

  /** Interval-overlap join: pairs where [lStart, lEnd) ∩ [rStart, rEnd) is
    * non-empty (plus equality on `keys`), without the nested loop the
    * declarative `ls < re && rs < le` plans to.
    *
    * Both sides explode over their covered buckets and equi-join on
    * (keys…, bucket); an overlapping pair shares EVERY bucket the overlap
    * region touches, so the exact predicate alone would duplicate the
    * pair. The first-common-bucket rule dedups for free — the overlap's
    * first instant is max(lStart, rStart), so the pair is kept only in
    * THAT bucket (`bucket == floor(max(lStart, rStart) / bucketWidth)`),
    * which both sides provably cover exactly when they overlap. One
    * predicate instead of a distinct over the pair set — the 1-D form of
    * the grid join's first-common-cell rule (geo/GridJoin.scala). */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = explodeBuckets(left, lStart, lEnd, bucketWidth,
      maxBucketsPerInterval)
    val r = explodeBuckets(right, rStart, rEnd, bucketWidth,
      maxBucketsPerInterval)
    l.join(r, keys :+ "__rb", "inner")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__rb") ===
          floor(greatest(col(lStart), col(rStart)) / bucketWidth).cast("long"))
      .drop("__rb")
  }

  private def explodeBuckets(df: DataFrame, start: String, end: String,
                             bucketWidth: Long,
                             maxBucketsPerInterval: Int): DataFrame = {
    val lo = floor(col(start) / bucketWidth).cast("long")
    val hi = floor((col(end) - 1) / bucketWidth).cast("long")
    // the guard is ARITHMETIC (hi - lo + 1), checked BEFORE sequence()
    // materializes anything: a dirty-parse end ≈ +∞ must hit raise_error,
    // not allocate a billion-element bucket array per row first. CaseWhen
    // evaluates only the taken branch, so the oversized sequence is never
    // built. Null bounds fall through to a null list (dropped by explode —
    // inner-join semantics), never to the raise.
    val buckets =
      when(col(start).isNull || col(end).isNull,
        lit(null).cast("array<long>"))
        .when(col(end) <= col(start), array().cast("array<long>"))
        .when(hi - lo < maxBucketsPerInterval, sequence(lo, hi))
        .otherwise(raise_error(concat(
          lit(s"RangeJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets — a disguised cross join; " +
            "widen bucketWidth, clamp the interval, or raise " +
            "maxBucketsPerInterval; bucket count = "),
          (hi - lo + 1).cast("string"))))
    df.withColumn("__rb", explode(buckets))
  }

  def pointInInterval(points: DataFrame, pt: String,
                      intervals: DataFrame, start: String, end: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__rb",
      floor(col(pt) / bucketWidth).cast("long"))
    // empty/inverted intervals → empty bucket list (no pt can satisfy
    // start <= pt < end); null bounds → null list, dropped by explode
    val iv = explodeBuckets(intervals, start, end, bucketWidth,
      maxBucketsPerInterval)
    p.join(iv, keys :+ "__rb", "inner")
      .where(col(pt) >= col(start) && col(pt) < col(end))
      .drop("__rb")
  }
}
