package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Streaming distribution-drift monitor: the stateful surface of
  * [[graft.ext.CorpusOps.psiDrift]]. The stream's bin counts accumulate in
  * Spark's built-in streaming aggregation state (state size is bin
  * cardinality, the same bound the batch operator's shuffle carries) and
  * are emitted in COMPLETE mode — required, not a convenience: psiAgainst
  * needs the FULL cumulative bin table each trigger (update mode would
  * deliver only the bins the trigger touched, silently breaking PSI
  * parity). Every micro-batch the CURRENT cumulative distribution is
  * scored against a STATIC reference snapshot with the identical
  * add-alpha PSI arithmetic. Each trigger's output is therefore exactly
  * `psiDrift(reference, stream-so-far)` — locked by the batch-parity
  * spec — so an alert threshold on `psi_contrib` behaves identically
  * whether the corpus arrives as one batch or as a stream.
  *
  * Scale shape: the state UPDATE per trigger touches only the bins present
  * in that batch; complete-mode output re-emits all bin-cardinality rows,
  * which is exactly the frame the PSI join needs against the broadcast
  * reference counts. Nothing corpus-sized is ever held in state.
  */
object DriftMonitor {

  /** Cumulative streaming bin counts, emitted complete-mode by [[psiQuery]]
    * (the full bin table each trigger): (bin, n_cur). */
  def binCounts(stream: DataFrame, bin: Column): DataFrame =
    stream.groupBy(bin.as("bin")).agg(count(lit(1)).as("n_cur"))

  /** Wire the monitor: every micro-batch, score the cumulative counts
    * against `refCounts` ((bin, n_ref) — a static snapshot aggregate) and
    * hand the per-bin PSI frame to `sink`. The arithmetic is
    * [[graft.ext.CorpusOps.psiDrift]]'s, re-expressed over the already-
    * aggregated counts (full-outer bin join, add-alpha smoothing over the
    * union of bins, 6-dp round). */
  def psiQuery(stream: DataFrame, bin: Column, refCounts: DataFrame,
               alpha: Double = 0.5,
               trigger: Trigger = Trigger.AvailableNow())
              (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(alpha > 0, "alpha must be positive (zero re-introduces infinities)")
    binCounts(stream, bin)
      .writeStream
      .outputMode(OutputMode.Complete()) // bin-cardinality rows, by design
      .trigger(trigger)
      .foreachBatch { (cur: DataFrame, id: Long) =>
        sink(psiAgainst(refCounts, cur, alpha), id)
      }
  }

  /** PSI of pre-aggregated counts: `ref` = (bin, n_ref), `cur` =
    * (bin, n_cur). Same null-safe full-outer + totals discipline as the
    * batch operator (a NULL bin on both sides is ONE bin). */
  def psiAgainst(ref: DataFrame, cur: DataFrame, alpha: Double): DataFrame = {
    val rc = ref.select(col("bin").as("__rbin"), col("n_ref").as("__nr"))
    val cc = cur.select(col("bin").as("__cbin"), col("n_cur").as("__nc"))
    val joined = rc.join(cc, col("__rbin") <=> col("__cbin"), "full_outer")
      .select(coalesce(col("__rbin"), col("__cbin")).as("bin"),
        col("__nr"), col("__nc"))
    val totals = rc.agg(sum(col("__nr")).cast("double").as("__tot_r"))
      .crossJoin(cc.agg(sum(col("__nc")).cast("double").as("__tot_c")))
      .crossJoin(rc.select(col("__rbin").as("bin"))
        .unionByName(cc.select(col("__cbin").as("bin")))
        .distinct().agg(count(lit(1)).cast("double").as("__nbins")))
    val pC = (coalesce(col("__nc"), lit(0L)).cast("double") + lit(alpha)) /
      (col("__tot_c") + lit(alpha) * col("__nbins"))
    val pR = (coalesce(col("__nr"), lit(0L)).cast("double") + lit(alpha)) /
      (col("__tot_r") + lit(alpha) * col("__nbins"))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"),
        round((pC - pR) * log(pC / pR), 6).as("psi_contrib"))
  }
}
