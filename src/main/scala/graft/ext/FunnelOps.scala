package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnel conversion, cohort retention, and the
  * event-transition matrix — the ordered-behaviour queries a product or
  * training-telemetry event log answers.
  *
  * Scale shapes: everything here reduces to per-key aggregates and joins ON
  * THE KEY — never a self-join of the raw event table on an inequality.
  * The funnel folds one (aggregate → key-equi-join) step per stage, each
  * intermediate at most one row per key; retention is two aggregates and a
  * key join; transitions are one lag window + a types²-sized count table.
  */
object FunnelOps {

  /** Ordered funnel: for each key, the first time of step 1, the first
    * time of step 2 AFTER that, … (strictly increasing chain — the classic
    * "signup → activate → purchase" conversion). Output: one row per key
    * that completed step 1, with `t1..tN` (µs, null once the chain stops)
    * and `depth` = completed steps.
    *
    * Each stage is min-aggregated per key BEFORE its join, so every join
    * is key-to-key (≤ 1 row per key per side) — the raw event table is
    * touched once per stage, filtered to that stage's type, and never
    * joined to itself on a time inequality. */
  def funnel(events: DataFrame, key: Column, tsMicros: Column, etype: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    val base = events.select(key.as("k"), tsMicros.as("__ts"),
      etype.as("__et"))
    var acc = base.where(col("__et") === steps.head)
      .groupBy("k").agg(min(col("__ts")).as("t1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val nxt = base.where(col("__et") === st)
        .join(acc.select(col("k"), col(prev)), Seq("k"))
        .where(col("__ts") > col(prev))
        .groupBy("k").agg(min(col("__ts")).as(cur))
      acc = acc.join(nxt, Seq("k"), "left")
    }
    val depth = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("depth", depth.cast("long"))
  }

  /** Cohort retention: keys cohorted by their first active week (epoch
    * week index — identical integer arithmetic in any engine, no calendar
    * dependence), counted once per (cohort, weeks-since-cohort) cell.
    * Output: (cohort_week, week_offset, n_active).
    *
    * The week index is floor(ts/week) — floor, not truncate-toward-zero,
    * so pre-epoch timestamps land in week −1, matching SQL `//`. Exact for
    * |ts| < 2^53 µs (i.e. every timestamp between the years ~1684 and
    * ~2255). */
  def retention(events: DataFrame, key: Column, tsMicros: Column): DataFrame = {
    val weekUs = 7L * 86400 * 1000000
    val act = events.select(key.as("k"),
      floor(tsMicros.cast("long") / weekUs).cast("long").as("__wk")).distinct()
    val cohort = act.groupBy("k").agg(min(col("__wk")).as("cohort_week"))
    act.join(cohort, Seq("k"))
      .groupBy(col("cohort_week"),
        (col("__wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** First-order transition matrix: counts and row-normalised probabilities
    * of event type `a` being followed by `b` within the same key's stream.
    * The lag pairing is one window (one exchange); the normalisation
    * window runs over the aggregated types² table, partitioned by the
    * source type — never over raw events. Probabilities are rounded to
    * 4 dp (house rule). */
  def transitions(events: DataFrame, key: Column, tsMicros: Column,
                  tiebreak: Column, etype: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMicros.asc, tiebreak.asc)
    val pairs = events
      .select(etype.as("a"), lead(etype, 1).over(w).as("b"))
      .where(col("b").isNotNull)
    val counts = pairs.groupBy("a", "b").agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy(col("a"))), 4))
  }
}
