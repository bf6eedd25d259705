package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Distributed prefix scans. The one implementation of the two-level
  * cumulative sum that [[TextOps.negativeSamples]], [[EvalOps.aucRoc]] and
  * [[EvalOps.averagePrecision]] route through — replacing their former
  * GLOBAL cumulative windows (no partition key → a single-partition
  * WindowExec, the classic prefix-scan bottleneck) with a shape that has
  * NO single-partition stage anywhere:
  *
  *   1. bucket every row with a caller-supplied ORDER-MONOTONE integer
  *      bucketing expression (s1 ≤ s2 ⟹ bucket(s1) ≤ bucket(s2), values
  *      in [0, nBuckets));
  *   2. per-bucket cumulative sums — an ordinary hash-partitioned window
  *      (parallel across buckets);
  *   3. per-bucket TOTALS collapse to a ≤ nBuckets-row frame; each
  *      total row explodes to the buckets it offsets (strictly later in
  *      scan order — ≤ nBuckets² rows, parameter-bounded), aggregates to
  *      one additive offset per bucket, and broadcast-joins back. No
  *      driver collect, no nested-loop join, no global window — the
  *      offset arithmetic is itself ordinary partial-aggregated algebra.
  *
  * Value columns MUST be integral: integer addition is associative, so
  * intra-bucket sum + bucket offset is BIT-IDENTICAL to the sequential
  * global scan no matter how rows are partitioned — the rewrite is
  * result-invariant by construction (enforced with a type check; a float
  * cumsum would change association order and drift). Callers with float
  * weights quantize first ([[TextOps.negativeSamples]]'s integer-exact
  * weights — the weightedBernoulli convention).
  *
  * The input frame is referenced TWICE (the per-bucket window and the
  * totals aggregate) — NOT a double computation of the caller's upstream
  * pipeline: both branches require the same partitioning of the same
  * subtree, so ReuseExchange shares one shuffle (verified on
  * x_neg_sample: 4 ReusedExchange nodes, the vocab subtree's FileScan
  * appears once).
  */
object ScanOps {

  /** Appends one INCLUSIVE cumulative-sum column per `(in, out)` pair in
    * `values`, cumulating in ascending (or descending) `order`.
    *
    * @param order      global scan order; must be unique per row (callers
    *                   cumulate over grouped/distinct keys, so it is)
    * @param descending scan from the largest `order` value down
    * @param bucket     integer bucket in [0, nBuckets), monotone
    *                   NON-DECREASING in `order` regardless of scan
    *                   direction (the helper flips offset flow itself
    *                   when `descending`); must be non-null wherever
    *                   `order` is
    * @param nBuckets   static bucket-space size (the offset explode is
    *                   bounded by nBuckets² rows — keep it ≤ a few
    *                   thousand)
    * @param values     (input column, output cumsum column) pairs; inputs
    *                   must be integral types
    */
  def cumSum(df: DataFrame, order: Column, descending: Boolean,
             bucket: Column, nBuckets: Int,
             values: Seq[(String, String)]): DataFrame = {
    require(values.nonEmpty, "cumSum: need at least one value column")
    // 4096² = 16.8M exploded offset rows (~hundreds of MB peak) is the
    // operating envelope the broadcast join-back tolerates; the former
    // 65536 allowance would admit a ~4.3B-row explode the doc warned
    // against without enforcing
    require(nBuckets >= 1 && nBuckets <= 4096,
      s"cumSum: nBuckets must be in [1, 4096], got $nBuckets")
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    values.foreach { case (in, _) =>
      val dt = df.schema(in).dataType
      require(integral(dt),
        s"cumSum: value column $in must be integral (got $dt) — a two-level" +
          " FLOAT sum changes association order and is not result-invariant")
    }
    val bk = "__cs_bk"
    val outs = values.map(_._2)
    require(!(df.columns :+ bk).exists(outs.contains) &&
      !df.columns.contains(bk),
      s"cumSum: input must not already carry $bk or ${outs.mkString(", ")}")

    val withB = df.withColumn(bk, bucket.cast("int"))
    val wIn = Window.partitionBy(col(bk))
      .orderBy(if (descending) order.desc else order.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = values.foldLeft(withB) { case (d, (in, out)) =>
      d.withColumn(out, sum(col(in).cast("long")).over(wIn))
    }

    // per-bucket totals → exploded to every bucket STRICTLY LATER in scan
    // order → one offset row per bucket. sequence(lo, hi) with lo > hi
    // would produce a DESCENDING array, not an empty one — guard with the
    // when() so edge buckets contribute nothing.
    val totAggs = values.map { case (in, out) =>
      sum(col(in).cast("long")).as(s"__t_$out")
    }
    val later =
      if (descending) // scan order is bucket DESC: offsets go to lower ids
        when(col(bk) > 0, sequence(lit(0), col(bk) - 1))
      else
        when(col(bk) < nBuckets - 1, sequence(col(bk) + 1, lit(nBuckets - 1)))
    val offAggs = values.map { case (_, out) =>
      sum(col(s"__t_$out")).as(s"__off_$out")
    }
    val offsets = withB.groupBy(col(bk))
      .agg(totAggs.head, totAggs.tail: _*)
      .select(explode(later).as(bk) +: values.map { case (_, out) =>
        col(s"__t_$out")
      }: _*)
      .groupBy(col(bk))
      .agg(offAggs.head, offAggs.tail: _*)

    val keep = df.columns.map(col).toSeq ++ values.map { case (_, out) =>
      (col(out) + coalesce(col(s"__off_$out"), lit(0L))).as(out)
    }
    intra.join(broadcast(offsets), Seq(bk), "left").select(keep: _*)
  }
}
