package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi-join: build a Bloom filter over the build side's
  * join keys, broadcast it, and filter the probe side map-side BEFORE the
  * exact semi-join. Semantically identical to a plain left-semi join (Bloom
  * filters have no false negatives; the exact join removes the false
  * positives) — the point is shuffle volume: at 100 TB the probe side's
  * exchange shrinks to (match fraction + fpp) of the input, which is the
  * same mechanism as Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter), here as an explicit operator
  * the caller can size.
  *
  * The filter is built with a distributed aggregate
  * (`DataFrameStatFunctions.bloomFilter`) and collected to the driver —
  * its size is set by `expectedItems`/`fpp`, NOT by the data volume
  * (~1.2 bytes/item at 3% fpp), so the build side may be arbitrarily large
  * as long as its DISTINCT key count is bounded; 10^8 keys ≈ 90 MB is the
  * practical broadcast ceiling. The probe-side test is a Scala UDF — a
  * per-row hash probe whose cost dwarfs dispatch overhead, the justified
  * UDF case.
  */
object BloomPrune {

  /** Probe rows whose long-typed `probeKey` appears in `build`'s
    * `buildKey`. Null probe keys are dropped (semi-join semantics). */
  def prunedSemiJoin(probe: DataFrame, probeKey: String,
                     build: DataFrame, buildKey: String,
                     expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val keys = build.select(col(buildKey).cast("long").as("__k"))
      .where(col("__k").isNotNull)
    val bf = keys.stat.bloomFilter("__k", expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    probe.where(might(col(probeKey).cast("long")))
      .join(keys.select(col("__k").as(probeKey)).distinct(), Seq(probeKey), "left_semi")
  }
}
