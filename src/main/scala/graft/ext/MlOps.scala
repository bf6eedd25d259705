package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model TRAINING for curation classifiers — the counterpart to
  * the inference-only paths ([[LmOps.hashedLinearScore]], [[LmOps.lmScore]]):
  *
  *   - Binary multinomial Naive Bayes (the classic cheap quality/language
  *     filter — one counting pass is the whole training job, so it is the
  *     first classifier anyone trains over a fresh 100 TB crawl).
  *   - Fixed-iteration batch-gradient logistic regression (the calibrated
  *     step up: each GD iteration is ONE map + partial-aggregated shuffle
  *     collapsing to a single (dims)-sized gradient row — the
  *     `treeAggregate` shape MLlib uses, expressed declaratively).
  *
  * Both are pure Catalyst expressions over the shared [[TextOps.tokens]]
  * stream; nothing model-sized is ever corpus-bound, nothing corpus-sized is
  * ever collected.
  */
object MlOps {

  // ---- Naive Bayes ----

  /** Per-token class log-likelihood ratios for binary multinomial NB with
    * add-alpha smoothing: lr(tok) = ln p(tok|pos) − ln p(tok|neg) where
    * p(tok|c) = (cnt_c + alpha) / (T_c + alpha·(V + 1)) — the
    * [[LmOps.lmScore]] smoothing discipline (one reserved OOV slot per
    * class), with V the shared training vocabulary, so the ratio table is
    * total over it and OOV tokens fall back to the smoothed constant at
    * score time.
    *
    * The reserved OOV slot is MATERIALISED as one row with `tok` NULL
    * carrying lr = ln((α/(T_p+α(V+1))) / (α/(T_n+α(V+1)))) — the
    * smoothed-constant ratio an unseen token scores at — so
    * [[naiveBayesScore]] can apply true NB semantics to any corpus, not
    * just the training one, without re-deriving the totals.
    *
    * Scale shape: ONE partial-aggregated shuffle on the token builds both
    * classes' counts simultaneously (conditional sums, not two passes);
    * the (T_p, T_n, V) totals are a one-row aggregate. The table is
    * vocabulary-sized — never broadcast (the tfidf lesson). */
  def naiveBayesModel(train: DataFrame, text: Column, label: Column,
                      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "alpha must be positive (zero breaks OOV smoothing)")
    val cnts = TextOps
      .withTokens(train, Seq(label.cast("boolean").as("__y")), text)
      .select(col("__y"), explode(col("__tk")).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__cp"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__cn"))
    val totals = cnts.agg(sum("__cp").cast("double").as("__Tp"),
      sum("__cn").cast("double").as("__Tn"),
      count(lit(1)).cast("double").as("__V"))
    val tokenRows = cnts.crossJoin(broadcast(totals))
      .select(col("tok"),
        (log((col("__cp").cast("double") + lit(alpha)) /
             (col("__Tp") + lit(alpha) * (col("__V") + lit(1.0)))) -
         log((col("__cn").cast("double") + lit(alpha)) /
             (col("__Tn") + lit(alpha) * (col("__V") + lit(1.0))))).as("lr"))
    val oovRow = totals.select(lit(null).cast("string").as("tok"),
      (log(lit(alpha) / (col("__Tp") + lit(alpha) * (col("__V") + lit(1.0)))) -
       log(lit(alpha) / (col("__Tn") + lit(alpha) * (col("__V") + lit(1.0)))))
        .as("lr"))
    tokenRows.unionByName(oovRow)
  }

  /** Score `docs` against a binary NB model: per document,
    * log_odds = ln(n_pos/n_neg) + Σ_tok occ·lr(tok), pred = log_odds > 0.
    * Output: (doc_id, n_tokens, log_odds, pred); zero-token documents are
    * absent (the [[LmOps.lmScore]] convention). `model` comes from
    * [[naiveBayesModel]] over the SAME alpha; `priorPos`/`priorNeg` are the
    * training class document counts (plain longs — two scalars, not data).
    *
    * Scale shape: the corpus token stream is pre-aggregated to
    * (doc_id, tok, occ) before the model join — repeats join once, hot
    * tokens join per-document not per-occurrence — then ONE shuffle join
    * on the token (vocabulary unbounded ⇒ never broadcast) and one final
    * partial-aggregated shuffle on doc_id. Tokens absent from the model
    * score the smoothed-constant OOV ratio ([[naiveBayesModel]]'s NULL-tok
    * row, shipped as a one-row broadcast) — so scoring a non-training
    * corpus follows NB semantics instead of silently dropping evidence; a
    * legacy model frame without the OOV row degrades to lr 0 for unseen
    * tokens. */
  def naiveBayesScore(docs: DataFrame, key: Column, text: Column,
                      model: DataFrame, priorPos: Long, priorNeg: Long,
                      alpha: Double = 0.1): DataFrame = {
    require(priorPos > 0 && priorNeg > 0, "both classes need training documents")
    val toks = TextOps.withTokens(docs, Seq(key.as("doc_id")), text)
      .select(col("doc_id"), explode(col("__tk")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("__occ"))
    val prior = math.log(priorPos.toDouble / priorNeg.toDouble)
    val oov = model.where(col("tok").isNull).select(col("lr").as("__oov_lr"))
    toks.join(model.where(col("tok").isNotNull), Seq("tok"), "left")
      .join(broadcast(oov), lit(true), "left")
      .groupBy("doc_id")
      .agg(sum("__occ").as("n_tokens"),
        round(lit(prior) +
            sum(coalesce(col("lr"), col("__oov_lr"), lit(0.0)) * col("__occ")), 6)
          .as("log_odds"))
      .withColumn("pred", col("log_odds") > 0)
  }

  // ---- logistic regression ----

  /** Batch-GD logistic regression over a numeric feature frame: `iters`
    * full-gradient steps w ← w − lr·∇, ∇_j = avg((σ(w·x) − y)·x_j), from
    * w = 0. Returns the per-iteration weight history (head = init, last =
    * final) — callers bind the final vector as literals for map-side
    * scoring ([[logisticScore]]).
    *
    * Engine-portability discipline: the per-row sigmoid is rounded to 6 dp
    * BEFORE the gradient average, the averaged gradient to 6 dp before the
    * update, and the updated weight to 6 dp (HALF_UP — SQL ROUND) — so a
    * DuckDB unroll of the same recurrence reproduces the trajectory exactly
    * (the x_pagerank/x_kcore unrolled-oracle convention, on doubles).
    *
    * Scale shape: each iteration is ONE map + partial-aggregated shuffle
    * collapsing the corpus to a single dims-wide gradient row (the
    * treeAggregate shape); only that row is collected — parameter-bounded,
    * like k-means centroids. The feature frame is persisted run-scoped
    * around the `iters` passes (the semDedup convention for re-read
    * inputs). */
  def logisticTrain(feats: DataFrame, xCols: Seq[String], yCol: String,
                    iters: Int, lr: Double): Seq[Array[Double]] = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(xCols.nonEmpty, "need at least one feature column")
    val f = feats.persist()
    try {
      // toList FORCES the lazy iterator before the finally unpersists —
      // a lazy Seq here would re-read the unpersisted frame per element
      Iterator.iterate(Array.fill(xCols.size)(0.0)) { w =>
        val p = round(sigmoid(margin(w, xCols)), 6)
        val err = p - col(yCol).cast("double")
        val g = f.agg(
            round(avg(err * col(xCols.head)), 6).as("g0"),
            xCols.tail.zipWithIndex.map { case (c, j) =>
              round(avg(err * col(c)), 6).as(s"g${j + 1}")
            }: _*)
          .head()
        w.indices.map(j => round6(w(j) - lr * g.getDouble(j))).toArray
      }.take(iters + 1).toList
    } finally f.unpersist()
  }

  /** Map-side scoring with literal-bound weights: (key, score, pred) with
    * score = round(σ(w·x), 6) — zero shuffles, zero joins; the model rides
    * the task binary as constants exactly like the PCA axes. */
  def logisticScore(feats: DataFrame, key: Column, xCols: Seq[String],
                    w: Array[Double]): DataFrame = {
    require(w.length == xCols.size, "weight/feature arity mismatch")
    val score = round(sigmoid(margin(w, xCols)), 6)
    feats.select(key.as("doc_id"), score.as("score"), (score >= 0.5).as("pred"))
  }

  private def margin(w: Array[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex
      .map { case (c, j) => lit(w(j)) * col(c) }
      .reduce(_ + _)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** SQL ROUND(x, 6) semantics (decimal HALF_UP) for the driver-side weight
    * update, matching both engines' round(). */
  private[ext] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
