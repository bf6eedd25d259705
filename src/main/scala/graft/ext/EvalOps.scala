package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation aggregates over scored corpora — the feedback half of
  * the classifier/LM scoring loop: once a quality model scores 100 TB, the
  * question "is it any good against the labels we have" must itself run as
  * one pass, not a sklearn collect.
  */
object EvalOps {

  /** ROC-AUC of `score` against boolean `label` via the Mann-Whitney
    * rank-sum with midrank tie handling — exactly what sklearn's
    * `roc_auc_score` computes, as relational algebra. Output: one row
    * (n_pos, n_neg, auc), auc rounded to 6 dp; null scores/labels are
    * excluded; degenerate inputs (single class) yield null auc.
    *
    * Scale shape: rows collapse FIRST to one row per distinct score (the
    * partial-aggregated groupBy — for a quality model emitting rounded
    * scores this is bounded by the score grid, not the corpus), and the
    * cumulative midranks ride ONE window over those distinct-score rows
    * ordered by score. The window is single-partition, but over the
    * score-distribution table, not the data — the [[CorpusOps
    * .quantileBuckets]] eval-side discipline. */
  def aucRoc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val byScore = df
      .select(score.cast("double").as("__s"), label.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
    val ranked = byScore
      .withColumn("__before", coalesce(sum(col("__n")).over(w), lit(0L)))
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
}
