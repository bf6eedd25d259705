package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation aggregates over scored corpora — the feedback half of
  * the classifier/LM scoring loop: once a quality model scores 100 TB, the
  * question "is it any good against the labels we have" must itself run as
  * one pass, not a sklearn collect.
  */
object EvalOps {

  /** Order-monotone 64-way bucket for [[ScanOps.cumSum]] over a score
    * axis: scores clamp into [0, 1] (probabilities in practice — anything
    * outside piles into the edge buckets, which only costs parallelism,
    * never correctness: clamping is non-strictly monotone, and cumSum
    * resolves ties-in-bucket by the order column inside the bucket's
    * window). */
  private def scoreBucket(s: Column): Column =
    floor(least(greatest(s, lit(0.0)), lit(1.0)) * 63).cast("int")

  /** Confusion counts + derived metrics at a decision threshold
    * (pred = score ≥ threshold): one row (tp, fp, tn, fn, precision,
    * recall, f1), metrics rounded to 6 dp and null when undefined (no
    * predicted/actual positives). ONE scan aggregate — no joins, no
    * window. */
  def confusionAtThreshold(df: DataFrame, score: Column, label: Column,
                           threshold: Double): DataFrame = {
    val s = score.cast("double"); val y = label.cast("boolean")
    val base = df.select(s.as("__s"), y.as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .select((col("__s") >= threshold).as("__p"), col("__y"))
    def n(p: Boolean, yy: Boolean) =
      sum(when(col("__p") === p && col("__y") === yy, 1L).otherwise(0L))
    base.agg(n(true, true).as("tp"), n(true, false).as("fp"),
        n(false, false).as("tn"), n(false, true).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round(col("tp") / (col("tp") + col("fp")), 6).as("precision"),
        round(col("tp") / (col("tp") + col("fn")), 6).as("recall"),
        round(lit(2.0) * col("tp") /
          (lit(2.0) * col("tp") + col("fp") + col("fn")), 6).as("f1"))
  }

  /** Calibration (reliability-diagram) bins: scores cut into `bins`
    * equal-width cells over [0, 1]; per cell the count, mean score, and
    * observed positive rate — a well-calibrated model has
    * frac_pos ≈ mean_score per bin. Score 1.0 lands in the top bin.
    * One partial-aggregated shuffle on the bin id (≤ `bins` rows). */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val s = score.cast("double"); val y = label.cast("boolean")
    df.select(s.as("__s"), y.as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .select(least(floor(col("__s") * bins), lit(bins - 1)).cast("long")
        .as("bin"), col("__s"), col("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("__s")), 6).as("mean_score"),
        round(avg(when(col("__y"), 1.0).otherwise(0.0)), 6).as("frac_pos"))
  }

  /** Per-stratum ROC-AUC — [[aucRoc]] partitioned by a stratum column
    * (per-domain / per-language classifier quality, the slice view that
    * catches a model scoring one source's gibberish as quality). Output:
    * one row (stratum, n_pos, n_neg, auc) per stratum; single-class
    * strata yield null auc rather than vanishing.
    *
    * Scale shape: identical to [[aucRoc]] except the midrank window is
    * PARTITIONED by stratum — distributed across strata instead of the
    * single-partition eval window, so this form scales with stratum
    * count; rows still collapse to (stratum, score) grid cells first. */
  def aucRocByStratum(df: DataFrame, stratum: Column, score: Column,
                      label: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val byScore = df
      .select(stratum.as("__g"), score.cast("double").as("__s"),
        label.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__g", "__s")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
    byScore
      .withColumn("__before", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__midrank",
        col("__before") + (col("__n") + lit(1.0)) / lit(2.0))
      .groupBy("__g")
      .agg(sum("__np").as("n_pos"),
        (sum("__n") - sum("__np")).as("n_neg"),
        sum(col("__midrank") * col("__np")).as("__rsum"))
      .select(col("__g").as("stratum"), col("n_pos"), col("n_neg"),
        round((col("__rsum") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** ROC-AUC of `score` against boolean `label` via the Mann-Whitney
    * rank-sum with midrank tie handling — exactly what sklearn's
    * `roc_auc_score` computes, as relational algebra. Output: one row
    * (n_pos, n_neg, auc), auc rounded to 6 dp; null scores/labels are
    * excluded; degenerate inputs (single class) yield null auc.
    *
    * Scale shape: rows collapse FIRST to one row per distinct score (the
    * partial-aggregated groupBy — for a quality model emitting rounded
    * scores this is bounded by the score grid, not the corpus), and the
    * cumulative midranks ride [[ScanOps.cumSum]]'s two-level scan over
    * those distinct-score rows (per-bucket windows + broadcast offsets —
    * NO single-partition WindowExec even if scores go near-unique at
    * corpus scale; integer counts make the two-level sum bit-identical to
    * the sequential scan the oracle replays). */
  def aucRoc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = df
      .select(score.cast("double").as("__s"), label.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
    val ranked = ScanOps.cumSum(byScore, order = col("__s"),
        descending = false, bucket = scoreBucket(col("__s")), nBuckets = 64,
        values = Seq("__n" -> "__cumn"))
      // exclusive prefix from the inclusive scan
      .withColumn("__before", col("__cumn") - col("__n"))
      // midrank of every row tied at this score: before + (n + 1) / 2
      .withColumn("__midrank",
        col("__before") + (col("__n") + lit(1.0)) / lit(2.0))
    ranked.agg(
        sum("__np").as("n_pos"),
        (sum("__n") - sum("__np")).as("n_neg"),
        sum(col("__midrank") * col("__np")).as("__rsum"))
      .select(col("n_pos"), col("n_neg"),
        round((col("__rsum") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Average precision (PR-AUC in the threshold-step form):
    * AP = Σ_k (R_k − R_{k−1})·P_k over DISTINCT scores DESCENDING, with
    * TP_k/FP_k cumulative at threshold s_k — the class-imbalance-honest
    * complement to [[aucRoc]] (ROC-AUC stays optimistic when positives are
    * rare; curation filters usually hunt a rare class). Tie-safe by
    * construction: a tied score block is ONE threshold step. Output:
    * (n_pos, n_neg, pr_auc) rounded to 6 dp; null AP when a class is
    * absent.
    *
    * Scale shape: the [[aucRoc]] discipline — the corpus collapses
    * map-side to distinct scores, and the cumulative TP/total counters
    * ride [[ScanOps.cumSum]]'s two-level scan over the distinct-score
    * rows descending (per-bucket windows + broadcast offsets — NO
    * single-partition WindowExec even when scores go near-unique at
    * corpus scale; integer counts make the two-level sum bit-identical
    * to the sequential scan the oracle replays). */
  def averagePrecision(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = df
      .select(score.cast("double").as("__s"), label.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
    ScanOps.cumSum(byScore, order = col("__s"), descending = true,
        bucket = scoreBucket(col("__s")), nBuckets = 64,
        values = Seq("__np" -> "__tp", "__n" -> "__tot"))
      .agg(sum("__np").as("n_pos"), (sum("__n") - sum("__np")).as("n_neg"),
        sum(col("__np") * col("__tp") / col("__tot").cast("double"))
          .as("__apsum"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__apsum") / col("n_pos"), 6)).as("pr_auc"))
  }

  /** Brier score: mean squared error of the probability against the 0/1
    * label — the proper scoring rule that punishes miscalibration where
    * [[aucRoc]] (rank-only) cannot see it. One scan aggregate. */
  def brierScore(df: DataFrame, score: Column, label: Column): DataFrame =
    df.select(score.cast("double").as("__s"),
        when(label.cast("boolean"), 1.0).otherwise(0.0).as("__y"))
      .where(col("__s").isNotNull && label.isNotNull)
      .agg(count(lit(1)).as("n"),
        round(avg((col("__s") - col("__y")) * (col("__s") - col("__y"))), 6)
          .as("brier"))
}
