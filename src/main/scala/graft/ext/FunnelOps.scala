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

  /** Item-item co-visitation similarity (the co-occurrence backbone of
    * neighbourhood collaborative filtering): for every item pair, the
    * number of keys (users) that touched both, cosine-normalised by the
    * items' marginal user counts — `n_ab / sqrt(n_a · n_b)`.
    *
    * Shape: the (key, item) de-dup is one shuffle; pairs are generated
    * IN-PLACE from each key's sorted item array (the [[graft.ext.DedupOps
    * .lshCandidates]] trick — no self-join of the (key, item) table, whose
    * equi-join on key would shuffle the whole table twice and explode on
    * hot users); the pair aggregate partial-aggregates map-side. Per-key
    * work is O(items²), which is why `maxItemsPerKey` raises loudly
    * (inside the consumed array column, so pruning can't drop it) instead
    * of letting a crawler account with a million distinct items cross-
    * product silently — cap-and-sample power users upstream, as every
    * production co-visit pipeline does. The marginal join is hint-free:
    * item cardinality is corpus-dependent (the [[graft.ext.CorpusOps
    * .tfidfTopTerms]] vocabulary convention). */
  def coVisitation(events: DataFrame, key: Column, item: Column,
                   maxItemsPerKey: Int = 10000): DataFrame = {
    require(maxItemsPerKey > 1, "maxItemsPerKey must be > 1")
    val ui = events.select(key.as("__k"), item.as("__i"))
      .where(col("__i").isNotNull).distinct()
    val marg = ui.groupBy("__i").agg(count(lit(1)).as("__n"))
    val sets = ui.groupBy("__k")
      .agg(array_sort(collect_list(col("__i"))).as("__items"))
      .withColumn("__items",
        when(size(col("__items")) <= maxItemsPerKey, col("__items"))
          .otherwise(raise_error(concat(
            lit(s"coVisitation: key with more than maxItemsPerKey=" +
              s"$maxItemsPerKey distinct items — quadratic pair blowup; " +
              "cap or sample power keys upstream; item count = "),
            size(col("__items")).cast("string")))))
    val pairsExpr = flatten(transform(
      sequence(lit(1), size(col("__items")) - 1),
      j => transform(sequence(lit(0), j - 1),
        i => struct(col("__items")(i).as("a"), col("__items")(j).as("b")))))
    val counts = sets.where(size(col("__items")) > 1)
      .select(explode(pairsExpr).as("p"))
      .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
    counts
      .join(marg.select(col("__i").as("item_a"), col("__n").as("__na")),
        "item_a")
      .join(marg.select(col("__i").as("item_b"), col("__n").as("__nb")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab") / sqrt(col("__na") * col("__nb")), 4).as("cosine"))
  }
}
