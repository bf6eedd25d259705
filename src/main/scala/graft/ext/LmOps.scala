package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language-model-based corpus quality scoring:
  *
  *   - CCNet-style unigram perplexity (Wenzek et al. 2020, "CCNet:
  *     Extracting high quality monolingual datasets from web crawl data"):
  *     score every document by an add-alpha unigram LM trained on a
  *     reference slice; low perplexity ≈ reference-like text. The real
  *     CCNet uses a 5-gram KenLM — the operator shape (train counts on a
  *     reference, shuffle-join them onto the corpus token stream, aggregate
  *     per document) is identical, and the unigram form keeps the oracle
  *     exact.
  *   - DSIR importance weights (Xie et al. 2023, "Data Selection for
  *     Language Models via Importance Resampling"): hashed n-gram bag
  *     features; per-document weight = sum of feature log-ratios between a
  *     target and a raw distribution.
  *
  * Both reuse the canonical [[TextOps.tokens]] stream.
  */
object LmOps {

  /** (tok, cnt) unigram occurrence counts over the reference slice. One
    * partial-aggregated shuffle on the token — the map side collapses
    * repeats before the exchange. */
  def unigramCounts(ref: DataFrame, text: Column,
                    tokenizer: Column => Column = TextOps.tokens): DataFrame =
    TextOps.withTokens(ref, Seq.empty, text, tokenizer = tokenizer)
      .select(explode(col("__tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Per-document add-alpha unigram LM score against `refCounts`
    * (from [[unigramCounts]]). Output: (doc_id, n_tokens, avg_logp, ppl);
    * documents with zero tokens are absent.
    *
    * logp(tok) = ln((cnt + alpha) / (T + alpha * (V + 1))) with cnt = 0 for
    * out-of-vocabulary tokens; T = total reference occurrences, V = distinct
    * reference vocabulary (the +1 reserves one smoothing slot for the OOV
    * class, so probabilities stay sub-stochastic rather than leaking mass).
    * ppl = exp(-avg logp), computed from the ROUNDED average so both engines
    * exponentiate the identical input.
    *
    * Scale shape: the corpus token stream is pre-aggregated to
    * (doc_id, tok, occurrences) BEFORE the join — a document repeating a
    * token joins it once, not once per occurrence, which cuts the join input
    * by the within-doc repeat factor and blunts hot-token skew at the source
    * (a stop-word's join rows drop from Σ occurrences to Σ distinct docs).
    * The pre-aggregation itself partial-aggregates map-side on (doc_id, tok)
    * — near-free, since repeats collapse before the exchange. The join on
    * `tok` stays a SHUFFLE join — the vocabulary of a web-scale reference is
    * unbounded, so it is never broadcast (the tfidfTopTerms lesson); AQE may
    * still downgrade to broadcast when the reference is genuinely small. The
    * (T, V) totals are a one-row aggregate, broadcast-cross-joined.
    * Per-document stats weight each token's log-prob by its occurrence
    * count, so the output is identical to the per-occurrence form AFTER the
    * 6-dp rounding: sum(lp·occ)/sum(occ) changes IEEE summation order and
    * operand values vs a per-occurrence avg(lp), so equality holds modulo
    * the rounding discipline, not bit-exactly — a value landing on a .5e-6
    * boundary could in principle round differently (same approx-vs-exact
    * contract as quantileBucketsApprox vs its ntile oracle). */
  def lmScore(docs: DataFrame, key: Column, text: Column,
              refCounts: DataFrame, alpha: Double = 0.1,
              tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    require(alpha > 0, "alpha must be positive (zero breaks OOV smoothing)")
    val toks = TextOps.withTokens(docs, Seq(key.as("doc_id")), text,
        tokenizer = tokenizer)
      .select(col("doc_id"), explode(col("__tk")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("__occ"))
    val totals = refCounts.agg(sum("cnt").cast("double").as("__T"),
      count(lit(1)).cast("double").as("__V"))
    val wavg = sum(col("__lp") * col("__occ")) / sum(col("__occ"))
    toks.join(refCounts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("__occ"),
        log((coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
          (col("__T") + lit(alpha) * (col("__V") + lit(1.0)))).as("__lp"))
      .groupBy("doc_id")
      .agg(sum("__occ").as("n_tokens"),
        round(wavg, 6).as("avg_logp"),
        round(exp(-round(wavg, 6)), 4).as("ppl"))
  }

  /** Pruned conditional-probability bigram model (the KenLM-style step up
    * from [[unigramCounts]]): (bg = "prev cur", pbi = cnt(bg)/ctot(prev)),
    * keeping only bigrams seen at least `minCount` times. Context totals
    * are computed over the PRE-prune counts, so surviving probabilities
    * stay sub-stochastic (pruned mass is simply dropped, the standard
    * count-pruning discipline) and the model table shrinks by the corpus's
    * long tail — the entire point of pruning at web scale.
    *
    * Scale shape: one partial-aggregated shuffle for the bigram counts,
    * one for the context totals (both model-sized, not corpus-sized), and
    * a model-side join on the context. Nothing is collected or broadcast —
    * a web-scale bigram vocabulary is unbounded. */
  def bigramModel(ref: DataFrame, text: Column, minCount: Int = 2): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val bc = TextOps.withTokens(ref, Seq.empty, text, "__toks")
      .select(explode(TextOps.shingles(col("__toks"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("__c"))
    val ct = bc.groupBy(split(col("bg"), " ").getItem(0).as("__ctx"))
      .agg(sum("__c").cast("double").as("__ctot"))
    bc.where(col("__c") >= minCount)
      .join(ct, split(col("bg"), " ").getItem(0) === col("__ctx"))
      .select(col("bg"), (col("__c") / col("__ctot")).as("pbi"))
  }

  /** Per-document interpolated bigram LM score (Jelinek-Mercer):
    * logp(cur | prev) = ln(λ·p_bi + (1-λ)·p_uni) with p_bi = 0 for pruned
    * or unseen bigrams and p_uni the [[lmScore]] add-alpha unigram —
    * always positive, so the log is finite everywhere. Output:
    * (doc_id, n_bigrams, avg_logp, ppl); documents with fewer than two
    * tokens are absent. `model` comes from [[bigramModel]], `refCounts`
    * from [[unigramCounts]] over the same reference slice.
    *
    * Scale shape: the corpus bigram stream is pre-aggregated to
    * (doc_id, bg, occurrences) before any join (the [[lmScore]]
    * convention — repeats join once), then takes two SHUFFLE joins
    * (model on the bigram key, unigram on the current token — neither
    * table is broadcastable at web scale) and one final partial-aggregated
    * shuffle on doc_id. */
  def bigramLmScore(docs: DataFrame, key: Column, text: Column,
                    model: DataFrame, refCounts: DataFrame,
                    lambda: Double = 0.7, alpha: Double = 0.1): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0, 1)")
    require(alpha > 0, "alpha must be positive (zero breaks OOV smoothing)")
    val toks = TextOps.withTokens(docs, Seq(key.as("doc_id")), text, "__toks")
      .select(col("doc_id"), explode(TextOps.shingles(col("__toks"), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("__occ"))
    val totals = refCounts.agg(sum("cnt").cast("double").as("__T"),
      count(lit(1)).cast("double").as("__V"))
    val wavg = sum(col("__lp") * col("__occ")) / sum(col("__occ"))
    toks
      .join(model, Seq("bg"), "left")
      .withColumn("tok", split(col("bg"), " ").getItem(1))
      .join(refCounts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("__occ"),
        log(lit(lambda) * coalesce(col("pbi"), lit(0.0)) +
          lit(1 - lambda) *
            ((coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
             (col("__T") + lit(alpha) * (col("__V") + lit(1.0))))).as("__lp"))
      .groupBy("doc_id")
      .agg(sum("__occ").as("n_bigrams"),
        round(wavg, 6).as("avg_logp"),
        round(exp(-round(wavg, 6)), 4).as("ppl"))
  }

  /** Hashed n-gram feature counts (the DSIR feature space): token n-grams
    * hashed into `buckets` cells via the first 8 md5 hex digits. Returns
    * (bucket, cnt) — AT MOST `buckets` rows by construction, so unlike a
    * vocabulary table this is safely broadcast-able regardless of corpus
    * size: the bound is a parameter, not a property of the data. */
  def hashedNgramCounts(ref: DataFrame, text: Column, n: Int, buckets: Int): DataFrame = {
    require(n > 0 && buckets > 0, "n and buckets must be positive")
    // tokens materialised in their own projection — shingles() indexes the
    // array per position, and an INLINED tokens expression would be
    // re-evaluated at every index (the O(n²)-per-row CollapseProject trap;
    // see TextOps.explodeShingles)
    TextOps.withTokens(ref, Seq.empty, text, "__toks")
      .select(explode(TextOps.shingles(col("__toks"), n)).as("ng"))
      .select((conv(substring(md5(col("ng")), 1, 8), 16, 10).cast("long")
        % buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** DSIR importance weight per document:
    * weight = sum over the doc's n-grams of ln(p_target(b) / p_raw(b)),
    * where p(b) = (cnt_b + alpha) / (T + alpha * buckets) under each
    * distribution. Output: (doc_id, n_ngrams, dsir_logw); documents with
    * fewer than n tokens are absent (they have no features).
    *
    * Scale shape: both count tables are bounded at `buckets` rows (see
    * [[hashedNgramCounts]]) so the per-bucket log-ratio table is built
    * driver-free and broadcast onto the corpus n-gram stream — the whole
    * scoring pass is map-side after the explode, with one final shuffle on
    * doc_id for the per-document sum. */
  def dsirWeights(docs: DataFrame, key: Column, text: Column,
                  target: DataFrame, raw: DataFrame, targetText: Column, rawText: Column,
                  n: Int = 2, buckets: Int = 1024, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val tc = hashedNgramCounts(target, targetText, n, buckets)
    val rc = hashedNgramCounts(raw, rawText, n, buckets)
    score(featsOf(docs, key, text, n, buckets),
      ratioTable(docs, tc, rc, buckets, alpha))
  }

  /** The canonical DSIR configuration — the RAW distribution is the scored
    * corpus itself (Xie et al. score the full crawl against a target slice):
    * the per-document feature stream is computed ONCE and the raw bucket
    * counts derive from it, instead of re-tokenising the whole corpus for a
    * second independent pass. Output is bit-identical to
    * `dsirWeights(raw = docs, rawText = text)` — the counts are integers
    * from the same stream, so every downstream double agrees (LmSpec locks
    * the equality). The feature stream feeds two branches (counts +
    * scoring), so it is persisted here, run-scoped — the semDedup
    * convention for operators whose plan forks. */
  def dsirWeightsSelfRaw(docs: DataFrame, key: Column, text: Column,
                         target: DataFrame, targetText: Column,
                         n: Int = 2, buckets: Int = 1024,
                         alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val feats = featsOf(docs, key, text, n, buckets).persist()
    val tc = hashedNgramCounts(target, targetText, n, buckets)
    val rc = feats.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    score(feats, ratioTable(docs, tc, rc, buckets, alpha))
  }

  /** fastText-style linear classifier scoring over the hashed n-gram
    * feature space (Joulin et al. 2017, "Bag of Tricks for Efficient Text
    * Classification" — the quality-classifier shape used by GPT-3/LLaMA
    * style curation pipelines): score = σ(bias + Σ_b w_b · cnt_b / F)
    * where F is the document's feature count (mean-pooled bag of hashed
    * n-grams, the fastText pooling). `weights` is a (bucket, weight) table
    * — in production the trained model's embedding-collapsed output layer;
    * buckets absent from it contribute zero. Output: (doc_id, n_feats,
    * score, pred) with score rounded to 6 dp and pred = score ≥ 0.5;
    * documents with fewer than `n` tokens have no features and are absent.
    *
    * Scale shape: the weight table is parameter-bounded at `buckets` rows
    * (the [[hashedNgramCounts]] argument), so it broadcasts regardless of
    * corpus size; scoring is map-side after the n-gram explode with ONE
    * partial-aggregated shuffle on doc_id. Inference over 100 TB is
    * embarrassingly parallel — exactly why the fastText shape, not a deep
    * scorer, is the curation workhorse. */
  def hashedLinearScore(docs: DataFrame, key: Column, text: Column,
                        weights: DataFrame, bias: Double = 0.0,
                        n: Int = 2, buckets: Int = 1024): DataFrame = {
    val z = lit(bias) + sum(col("__w")) / count(lit(1))
    val score = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    featsOf(docs, key, text, n, buckets)
      .join(broadcast(weights.select(col("bucket"),
        col("weight").cast("double").as("__wt"))), Seq("bucket"), "left")
      .select(col("doc_id"), coalesce(col("__wt"), lit(0.0)).as("__w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), score.as("score"),
        (score >= 0.5).as("pred"))
  }

  /** (doc_id, bucket) hashed-ngram feature stream. */
  private def featsOf(docs: DataFrame, key: Column, text: Column,
                      n: Int, buckets: Int): DataFrame =
    TextOps.withTokens(docs, Seq(key.as("doc_id")), text, "__toks")
      .select(col("doc_id"),
        explode(TextOps.shingles(col("__toks"), n)).as("ng"))
      .select(col("doc_id"),
        (conv(substring(md5(col("ng")), 1, 8), 16, 10).cast("long")
          % buckets).as("bucket"))

  /** Every bucket gets a ratio row (an unseen bucket's ratio is the
    * smoothed constant ln((Tr+aB)/(Tt+aB)), NOT zero), so the scoring
    * join is total. */
  private def ratioTable(docs: DataFrame, tc: DataFrame, rc: DataFrame,
                         buckets: Int, alpha: Double): DataFrame = {
    val tTot = tc.agg(sum("cnt").cast("double").as("__Tt"))
    val rTot = rc.agg(sum("cnt").cast("double").as("__Tr"))
    docs.sparkSession.range(buckets).select(col("id").as("bucket"))
      .join(tc.withColumnRenamed("cnt", "__ct"), Seq("bucket"), "left")
      .join(rc.withColumnRenamed("cnt", "__cr"), Seq("bucket"), "left")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col("bucket"),
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + lit(alpha)) /
             (col("__Tt") + lit(alpha) * buckets)) -
         log((coalesce(col("__cr"), lit(0L)).cast("double") + lit(alpha)) /
             (col("__Tr") + lit(alpha) * buckets))).as("__lr"))
  }

  private def score(feats: DataFrame, ratios: DataFrame): DataFrame =
    feats.join(broadcast(ratios), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        round(sum(col("__lr")), 6).as("dsir_logw"))
}
