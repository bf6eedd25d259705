package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering (Z-order / Morton
  * curve) for scan pruning.
  *
  * Why this exists at 100 TB: parquet/file-level min-max stats prune a scan
  * only along the sort order of the data. Sorting on one column makes that
  * column prunable and every other column's per-file range near-global;
  * interleaving the bits of d bucketed columns and range-partitioning on the
  * interleaved value bounds EVERY participating dimension within each
  * partition/file (each Z-range is a union of small d-dimensional tiles), so
  * selective predicates on ANY of the d columns skip most files. This is the
  * same mechanism Delta/Iceberg expose as `OPTIMIZE ZORDER BY` — here it is
  * a pure DataFrame transform: no table format required, works on any sink.
  */
object LayoutOps {

  /** Morton (Z-curve) code: interleave the low `bits` bits of each bucket
    * column — bucket j contributes its bit i at output position i·d + j.
    * Pure column arithmetic (shift/and/or), whole-stage-codegen'd; no UDF.
    *
    * Inputs must already be non-negative integer buckets < 2^bits (clamp or
    * quantile-bucket continuous columns first — equi-width via division, or
    * ntile for skewed dims). `bits · buckets.size` must fit a long (≤ 63).
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits > 0 && bits * buckets.size <= 63,
      s"zValue: need 0 < bits*dims <= 63, got bits=$bits dims=${buckets.size}")
    val d = buckets.size
    val terms = for {
      (c, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order a frame: range-partition on the Morton code of the bucket
    * columns and sort each partition by it, so downstream file sinks write
    * one tile-run per file and min-max stats become selective on every
    * bucketed dimension. The helper column is dropped — the layout is the
    * product, not a new column. */
  def zorderRepartition(df: DataFrame, buckets: Seq[Column], bits: Int,
                        numPartitions: Int): DataFrame =
    df.withColumn("__z", zValue(buckets, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
