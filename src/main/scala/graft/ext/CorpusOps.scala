package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level curation operators: cross-document boilerplate detection and
  * deterministic stratified sampling — the two ops that act on the corpus
  * distribution rather than on a document in isolation.
  */
object CorpusOps {

  /** Flag boilerplate: a k-shingle appearing in ≥ `minDocs` distinct
    * documents is "boilerplate" (navigation chrome, license headers, shared
    * templates); each document reports how much of it is made of such
    * shingles.
    *
    * Plan shape — the same as document-frequency/IDF computation, which is
    * what this is: one shingle explode, one groupBy(shingle) count (partial-
    * aggregated map-side, so a hot shingle is a map-side sum, not a skewed
    * reduce), one hash left-join back on shingle, one groupBy(doc) counting
    * rows and hits together. Documents shorter than k tokens have no
    * shingles and are absent from the output (nothing to measure).
    *
    * The shingle table feeds both the doc-frequency aggregate and the
    * join-back; this op deliberately does NOT persist it — an operator
    * cannot unpersist what its lazy result still needs, so cache lifecycle
    * belongs to the caller (pass a persisted frame to
    * [[boilerplateFromShingles]], as x_dedup_jaccard does for its
    * shingles). */
  def boilerplate(df: DataFrame, key: Column, text: Column,
                  k: Int, minDocs: Int): DataFrame =
    boilerplateFromShingles(TextOps.explodeShingles(df, key, text, k), minDocs)

  /** The shingle-table form: `sh` must be (doc_id, shingle) rows, distinct
    * per document (what [[TextOps.explodeShingles]] emits). */
  def boilerplateFromShingles(sh: DataFrame, minDocs: Int): DataFrame = {
    val common = sh.groupBy("shingle")
      .agg(count(lit(1)).as("__df")) // rows are distinct per doc ⇒ doc freq
      .where(col("__df") >= minDocs)
      .select(col("shingle"), lit(1).as("__hit"))
    sh.join(common, Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        round(col("n_boiler") / col("n_shingles").cast("double"), 4)
          .as("boiler_frac"))
  }

  /** Per-stratum distribution stats: count, mean, and interpolated
    * percentiles of a numeric column — the profiling pass that precedes
    * threshold-picking for quality filters.
    *
    * `exact = true` uses `percentile` (true interpolated quantiles, the
    * same index ⋅ (n−1) linear interpolation DuckDB's quantile_cont uses, so
    * it is oracle-checkable) — it buffers each group's values, so reserve it
    * for bounded-cardinality strata × bounded group sizes. `exact = false`
    * switches to `approx_percentile` (t-digest, constant memory per group) —
    * the 100-TB default; its results are engine-specific, so the correctness
    * contract there is the spec's exact-vs-approx tolerance assertion, not a
    * byte-compare. */
  def groupStats(df: DataFrame, stratum: Column, value: Column,
                 percentiles: Seq[Double], exact: Boolean): DataFrame = {
    val v = value.cast("double")
    val pcts = percentiles.map { p =>
      val c = if (exact) percentile(v, lit(p)) else percentile_approx(v, lit(p), lit(10000))
      round(c, 4).as(s"p${(p * 100).round}")
    }
    val aggs = count(lit(1)).as("n") +: round(avg(v), 4).as("mean") +: pcts
    df.groupBy(stratum.as("stratum")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-stratum quantile bucketing WITHOUT a per-stratum window — the
    * scale-safe form of "split the corpus by score percentile" (CCNet
    * head/middle/tail, Wenzek et al. 2020, is the canonical use). An
    * `ntile(k)` over `Window.partitionBy(stratum)` puts a hot stratum (the
    * dominant language of a web corpus) in ONE window partition: one task
    * sorts ~all rows. This operator instead computes per-stratum quantile
    * THRESHOLDS as a tiny aggregate (one row per stratum), broadcasts them,
    * and assigns `bucket` = 1 + #{thresholds strictly below value} as a pure
    * map — no per-stratum sort anywhere, and the data pass is embarrassingly
    * parallel.
    *
    * Exact/approx contract (the [[groupStats]] pattern): `exact = true` uses
    * `percentile` (DuckDB-compatible interpolation, oracle-checkable; buffers
    * each stratum's values in its aggregate buffer, so reserve it for
    * bounded strata sizes). `exact = false` uses `approx_percentile`
    * (t-digest, constant memory per stratum) — the 100-TB default; its
    * engine-specific thresholds are locked by the spec's tolerance assertion
    * against the exact form, not a byte-compare. Thresholds are rounded to
    * 6 dp before the compare so bucket membership is engine-portable.
    *
    * Semantics note: unlike ntile (equal-COUNT buckets, ties split
    * arbitrarily across buckets), threshold bucketing is a function of the
    * VALUE — ties always land in the same bucket, and bucket sizes can
    * differ near ties/boundaries; NULL values (null > t is null → 0) land in
    * bucket 1. The default broadcast is scale-correct for LANGUAGE-like
    * strata: the threshold table is #strata × (numBuckets−1) doubles —
    * bounded by strata cardinality, not data size (and a shuffle join here
    * would re-introduce the hot-stratum key this operator exists to avoid;
    * window skew has no AQE rescue). For DOMAIN-like strata (URL hosts,
    * user ids — unbounded cardinality) the threshold table itself grows with
    * the data and a forced broadcast is a driver OOM, so pass
    * `broadcastThresholds = false` to leave the join strategy to size-based
    * planning (the [[tfidfTopTerms]] broadcastVocab convention); skew is no
    * concern there because high-cardinality strata are by definition not
    * hot. */
  def quantileBuckets(df: DataFrame, stratum: Column, value: Column,
                      numBuckets: Int, exact: Boolean,
                      broadcastThresholds: Boolean = true): DataFrame = {
    require(numBuckets > 1, "numBuckets must be at least 2")
    val v = value.cast("double")
    val ths = (1 until numBuckets).map { i =>
      val p = i.toDouble / numBuckets
      val c = if (exact) percentile(v, lit(p))
              else percentile_approx(v, lit(p), lit(10000))
      round(c, 6).as(s"__qt$i")
    }
    val th = df.groupBy(stratum.as("__qs")).agg(ths.head, ths.tail: _*)
    val bucket = (1 until numBuckets).map(i =>
      when(v > col(s"__qt$i"), 1).otherwise(0)).reduce(_ + _) + lit(1)
    val thF = if (broadcastThresholds) broadcast(th) else th
    // null-safe: a NULL stratum is a legitimate group (the temperatureSample
    // convention) — a plain === would silently drop every such row
    df.join(thF, stratum <=> col("__qs"))
      .withColumn("bucket", bucket)
      .drop((1 until numBuckets).map(i => s"__qt$i") :+ "__qs": _*)
  }

  /** Source-level (domain-level) quality gate — the curation step that
    * evicts WHOLE sources, not documents: a domain whose aggregate quality
    * is poor is suspect even where individual pages score well (the
    * domain-blocklist step of the Gopher and CCNet/RefinedWeb web-corpus
    * pipelines). A source is evicted when it has enough evidence
    * (≥ `minDocs` documents) AND its mean score — rounded to 4 dp, the
    * house engine-portable compare — falls below `minMean`; a source with
    * too few documents passes (insufficient evidence is not guilt).
    *
    * Plan shape: one groupBy(source) aggregate (partially aggregated — one
    * row per source per map task reaches the shuffle, so a hot source is a
    * map-side sum, not a skewed reduce), verdict joined back onto the
    * corpus. `broadcastStats = true` (default) pins the stats table to a
    * broadcast — right for registry-like source sets whose cardinality is
    * bounded. For URL-host-like sources (cardinality grows with the data —
    * a forced broadcast is a driver OOM at 100 TB) pass false and leave the
    * join to size-based planning, the [[quantileBuckets]] convention.
    *
    * Output keeps every retained row with its source's (`src_n`,
    * `src_mean`) attached: the stats are already paid for, and downstream
    * threshold tuning reuses them without a second pass. Null sources form
    * a legitimate group (null-safe join, the [[temperatureSample]]
    * convention). */
  def sourceQualityGate(df: DataFrame, source: Column, score: Column,
                        minDocs: Long, minMean: Double,
                        broadcastStats: Boolean = true): DataFrame = {
    val stats = df.groupBy(source.as("__gs"))
      .agg(count(lit(1)).as("src_n"),
        round(avg(score.cast("double")), 4).as("src_mean"))
    val statsF = if (broadcastStats) broadcast(stats) else stats
    // coalesce(…, true): a NULL mean (all-null scores) is NO evidence of
    // low quality — without it the three-valued NOT drops the whole source
    df.join(statsF, source <=> col("__gs"))
      .where(coalesce(!(col("src_n") >= minDocs && col("src_mean") < minMean),
        lit(true)))
      .drop("__gs")
  }

  /** Top-k terms per document by tf-idf (tf · ln(N/df)) — the classic
    * keyword/summary extraction over a corpus. Shape: one token explode,
    * one (doc, tok) count, one doc-frequency aggregate joined back on the
    * token, the corpus size as a broadcast one-row frame (a count() action
    * or an unpartitioned window would both be wrong here), and one
    * per-document ranking window. Scores are rounded to 4 dp BEFORE ranking
    * (house rule) with ties to the lexicographically smallest token, so the
    * top-k set is engine-exact.
    *
    * Vocabulary-size contract: the df join on `tok` is a SHUFFLE join by
    * default. A web-scale corpus's distinct-token table (URLs, typos,
    * numerals) runs to billions of rows, so a forced broadcast there is a
    * driver OOM at 100 TB, not a plan choice AQE can undo; partial
    * aggregation already bounds the dfreq shuffle at one row per distinct
    * token per map task. Pass `broadcastVocab = true` ONLY when the
    * vocabulary is known-bounded (a fixed lexicon, a pre-pruned token set);
    * otherwise leave size-based planning to pick the strategy. */
  def tfidfTopTerms(df: DataFrame, key: Column, text: Column,
                    k: Int, broadcastVocab: Boolean = false): DataFrame = {
    val tok = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .select(col("doc_id"), explode(col("__toks")).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_cnt"))
    val dfreq0 = tf.groupBy("tok").agg(count(lit(1)).as("__df"))
    val dfreq = if (broadcastVocab) broadcast(dfreq0) else dfreq0
    val n = df.select(key.as("doc_id")).distinct()
      .agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf_cnt"),
        round(col("tf_cnt") * log(col("__n").cast("double") / col("__df")), 4)
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    scored.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .select(col("doc_id"), col("tok"), col("tf_cnt"), col("score"))
  }

  /** Okapi BM25 top-k retrieval for a fixed term set (Robertson et al.,
    * TREC-3): idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) summed over the
    * query terms, with idf = ln((N−df+0.5)/(df+0.5)+1).
    *
    * Scale shape — the query terms are a LITERAL list, so the corpus-sized
    * explode is filtered to them map-side (`filter` higher-order function
    * below the explode: a doc contributes only its query-term occurrences,
    * not its vocabulary). Everything downstream is therefore
    * query-term-sized: the df aggregate is ≤ |terms| rows (broadcast), the
    * (N, avgdl) corpus stats are ONE row (broadcast), and the final top-k
    * is an ordered limit (TakeOrderedAndProject), never a global sort.
    *
    * Full-corpus work: TWO map-side scan+tokenize passes (the corpus-stats
    * subtree and the tf subtree are independent branches of `toks`, and
    * Catalyst does not share subtrees across branches) — neither carries a
    * corpus-sized shuffle. To pay the tokenize once at 100 TB, persist the
    * (doc_id, dl, qt) projection upstream and pass it in — cache lifecycle
    * belongs to the caller (the [[boilerplate]] convention).
    *
    * Scores are rounded to 4 dp BEFORE ranking (house rule), ties to the
    * smallest doc_id. */
  def bm25TopK(df: DataFrame, key: Column, text: Column,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val terms = queryTerms.map(lit)
    val toks = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .select(col("doc_id"),
        size(col("__toks")).cast("double").as("__dl"),
        filter(col("__toks"), t => t.isin(terms: _*)).as("__qt"))
    // One row per corpus doc feeds the stats aggregate; only query-term
    // occurrences survive into the tf explode.
    val tf = toks.select(col("doc_id"), col("__dl"),
        explode(col("__qt")).as("tok"))
      .groupBy(col("doc_id"), col("__dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val stats = toks.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("__df"))
    tf.join(broadcast(dfreq), "tok").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0) *
          (col("__tf") * (k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__s"))
      .groupBy("doc_id").agg(round(sum(col("__s")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
    * any number of rankings into one by `score(d) = Σ_r 1/(k0 + rank_r(d))`
    * — the standard way to fuse lexical (BM25) and vector (ANN) retrieval
    * without calibrating incomparable score scales, since only RANKS enter.
    * Documents missing from a ranking simply contribute nothing for it.
    *
    * Each input is a (doc_id, rank) frame with rank starting at 1 —
    * produced upstream by a top-k retrieval, so inputs are k-row tiny and
    * the union+aggregate+ordered-limit here is negligible next to the
    * retrievals themselves. Scores round to 6 dp BEFORE the final rank
    * (house rule), ties to the smallest doc_id. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    require(k0 >= 0, "k0 must be non-negative")
    rankings.map(r => r.select(col("doc_id"),
        (lit(1.0) / (lit(k0) + col("rank"))).as("__s")))
      .reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(round(sum(col("__s")), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Exact phrase retrieval over a positional posting list — the classic
    * inverted-index phrase-AND: a phrase of terms t_0..t_{m-1} occurs at
    * anchor position a iff every slot s has token t_s at position a + s.
    * Each (doc, pos, tok) posting whose token appears in the phrase votes
    * for anchor `pos - s` on every phrase slot s it could fill; grouping
    * by (doc, anchor) and requiring all m DISTINCT slots turns the phrase
    * match into one aggregate — no m-way self-join of the posting table,
    * no per-row substring scans.
    *
    * Scale shape: the phrase-term filter sits BELOW the positional explode
    * (the [[bm25TopK]] convention — only phrase-term occurrences ever
    * leave the scan), so everything shuffled is phrase-term-sized: one
    * partial-aggregated shuffle on (doc, anchor), one on doc. Duplicate
    * terms in the phrase are handled by the slot fan-out (a token maps to
    * every slot it fills), and overlapping occurrences count separately —
    * each anchor is its own group. */
  def phraseSearch(df: DataFrame, key: Column, text: Column,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val slotsByTerm: Map[String, Seq[Int]] =
      phrase.zipWithIndex.groupBy(_._1).map { case (t, ps) => t -> ps.map(_._2) }
    val terms = slotsByTerm.keys.toSeq.map(lit)
    // positional postings, phrase terms only — struct(tok, pos) built
    // map-side over the token array, filtered before the explode
    val postings = TextOps
      .withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .select(col("doc_id"), explode(filter(
        transform(col("__toks"),
          (t, i) => struct(t.as("tok"), i.as("pos"))),
        x => x.getField("tok").isin(terms: _*))).as("__p"))
      .select(col("doc_id"), col("__p.tok").as("tok"), col("__p.pos").as("pos"))
    // slot fan-out: one row per (posting, phrase slot its token fills)
    val slotMap = map(slotsByTerm.toSeq.flatMap { case (t, ss) =>
      Seq(lit(t), lit(ss.toArray))
    }: _*)
    val votes = postings
      .select(col("doc_id"), col("pos"),
        explode(element_at(slotMap, col("tok"))).as("slot"))
      .select(col("doc_id"), (col("pos") - col("slot")).as("anchor"),
        col("slot"))
      .where(col("anchor") >= 0)
    // (doc, anchor, slot) is unique by construction — one posting row per
    // token position, distinct slots per term — so a plain count equals
    // count(DISTINCT slot) without the extra expand+shuffle a distinct
    // aggregate plans
    votes.groupBy("doc_id", "anchor")
      .agg(count(lit(1)).as("__m"))
      .where(col("__m") === phrase.size)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"))
  }

  /** PMI collocation mining: adjacent-bigram pointwise mutual information
    * ln(P(ab) / (P(a)·P(b))), the classic collocation score (Church &
    * Hanks 1990) — surfaces multiword expressions a corpus keeps together
    * ("new york", "machine learning") for tokenizer and phrase-vocab work.
    *
    * Shape: one bigram explode (transform over the token array — the pair
    * construction is map-side, no self-join of the token table), one
    * (a, b) count with partial aggregation, one unigram count, two
    * equi-joins of the bigram counts against the unigram table, and an
    * ordered limit. `minCount` prunes the bigram tail BEFORE the joins —
    * at web scale the hapax bigrams are the bulk of the table and carry
    * degenerate PMI anyway. The unigram side follows the
    * [[tfidfTopTerms]] vocabulary contract: shuffle join by default
    * (billions of distinct tokens at 100 TB), `broadcastVocab = true` only
    * for known-bounded lexicons. PMI is rounded to 4 dp BEFORE ranking,
    * ties lexicographic on (a, b).
    *
    * Full-corpus work: THREE map-side tokenize passes (unigram counts,
    * bigram pairs, and the Σ(len−1) total — independent branches, not
    * shared by Catalyst). Persist the tokenized projection upstream to pay
    * the scan once; the shuffles are count-table-sized either way. */
  def pmiCollocations(df: DataFrame, text: Column, minCount: Int, k: Int,
                      broadcastVocab: Boolean = false): DataFrame = {
    val toks = TextOps.withTokens(df, Seq.empty, text, "__toks")
    val uni = toks.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
    val uniJ = if (broadcastVocab) broadcast(uni) else uni
    val pairs = toks.select(explode(transform(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
        (t, i) => struct(t.as("a"), element_at(col("__toks"), i + 2).as("b"))))
      .as("bg"))
    val bi = pairs.select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    // Corpus totals as one broadcast row (no count() action, no
    // unpartitioned window). Σ bigrams must be over ALL bigrams — the
    // probability denominator — not the minCount survivors, and Σ(len−1)
    // per doc gives it without touching the bigram table again.
    val tot = uni.agg(sum(col("__c")).cast("double").as("__nu"))
      .crossJoin(toks.agg(sum(greatest(size(col("__toks")) - 1, lit(0)))
        .cast("double").as("__nb")))
    bi.join(uniJ.withColumnRenamed("__c", "__ca"), col("a") === col("tok"))
      .drop("tok")
      .join(uniJ.withColumnRenamed("__c", "__cb"), col("b") === col("tok"))
      .drop("tok")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n_ab"),
        round(log((col("n_ab") / col("__nb")) /
          ((col("__ca") / col("__nu")) * (col("__cb") / col("__nu")))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Benchmark decontamination: flag corpus documents sharing ≥ `minShared`
    * k-shingles with an evaluation set — the pre-training hygiene pass that
    * keeps test data out of the training corpus (n-gram-overlap
    * decontamination as practiced since GPT-3's appendix C; public method).
    *
    * Inputs are (doc_id, shingle) tables from [[TextOps.explodeShingles]].
    * The eval side is distinct-ed and broadcast — eval suites are tiny
    * relative to a 100-TB corpus, so the corpus-side shingles never shuffle:
    * one broadcast hash join + one groupBy(doc). */
  def contamination(corpusSh: DataFrame, evalSh: DataFrame,
                    minShared: Int): DataFrame = {
    val ev = broadcast(evalSh.select("shingle").distinct())
    corpusSh.join(ev, "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Deterministic next-fit sequence packing: assign documents to
    * fixed-token-budget bins (training-sequence packing). Documents are
    * md5-shuffled into `numBuckets` independent buckets; within a bucket
    * they pack in md5 order by running token sum, a document landing in the
    * bin where its FIRST token falls. That is next-fit semantics: a bin can
    * overflow by at most one document's tokens (exact first-fit-decreasing
    * is inherently sequential; this form is one window per bucket, fully
    * parallel across buckets, and reproducible on any engine with md5 —
    * size numBuckets ≈ cluster cores × a few so each bucket's window sorts
    * a manageable slice). */
  def packSequences(df: DataFrame, key: Column, nTokens: Column,
                    maxTokens: Int, numBuckets: Int): DataFrame = {
    require(maxTokens > 0 && numBuckets > 0, "maxTokens and numBuckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket"))
      .orderBy(col("__ord"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(key.as("doc_id"), nTokens.cast("long").as("n_tokens"),
        md5(key.cast("string")).as("__ord"))
      .withColumn("__bucket",
        pmod(conv(substring(col("__ord"), 1, 8), 16, 10).cast("long"),
          lit(numBuckets.toLong)))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("__bucket").cast("long").as("bucket"),
        floor((col("__cum") - col("n_tokens")) / maxTokens).cast("long").as("bin"),
        col("n_tokens"))
  }

  /** Deterministic WEIGHTED Bernoulli sampling: row kept with probability
    * proportional to its weight — P(keep) = w / max(w) — the
    * quality-weighted subsampling a training-mix pipeline runs (keep
    * high-quality documents with certainty, down-sample the tail in
    * proportion). The decision is EXACT INTEGER arithmetic: with
    * h = 32-bit md5 uniform and W = max weight, keep ⇔ h·W < w·2³² —
    * no float division, no pow/ln, so the house no-last-ulp rule holds by
    * construction and any engine replays the identical sample (both
    * products bound well inside a 64-bit long for 32-bit-ish weights).
    * Zero-or-negative weights never keep; the max-weight rows always do.
    *
    * Scale shape: one partial-aggregated max (a scalar broadcast — the
    * pageRank node-count class) + a map-side integer filter. For sampling
    * ∝ w against a FIXED target rate r instead of w/max(w), pass the
    * precomputed threshold through `weight` as w·r/W upstream — the
    * comparison form is unchanged. */
  def weightedBernoulli(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val w = weight.cast("long")
    val h = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    val wmax = df.agg(max(w).as("__wmax"))
    // overflow guard inside the consumed comparison (the maxBucket
    // raise_error convention): h·W needs W ≤ 2³¹ to stay in a long
    val wmaxChecked = when(col("__wmax") <= lit(Int.MaxValue.toLong),
      col("__wmax")).otherwise(raise_error(concat(
      lit("weightedBernoulli: max weight exceeds 2^31 — h*W would overflow " +
        "a long; rescale weights upstream; max = "),
      col("__wmax").cast("string"))))
    df.crossJoin(broadcast(wmax))
      .where(w > 0 && h * wmaxChecked < w * lit(4294967296L))
      .drop("__wmax")
  }

  /** Deterministic per-stratum sampling: row kept iff its md5-derived
    * uniform < the stratum's rate. Pure map-side filter — no shuffle, no RNG
    * state, reproducible on any engine with md5 (the house sampling idiom —
    * see the backfill sampler, SURVEY.md §2.2 Op-15). Rates land on values
    * an md5 uniform cannot exactly equal (k/2³² boundaries are hit with
    * probability 2⁻³²; rates like 0.3 are not representable as such a
    * boundary anyway), so keep/drop never depends on last-ulp behaviour. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val u = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val rateCol = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.where(u < rateCol)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): each row draws a deterministic md5 uniform u and is
    * ranked by -ln(u)/w — the k smallest keys are a weighted sample without
    * replacement, exactly (the quality-weighted subset-selection step of a
    * corpus mix: "keep the best 10 M documents, proportional to score").
    *
    * Scale shape: the key is a pure map over the row, and the top-k runs as
    * TakeOrderedAndProject (per-partition heap + driver merge of k-row
    * heads, the [[graft.queries]] work-limit convention) — no global sort,
    * no shuffle of the corpus. Keys are rounded to 6 dp BEFORE ranking with
    * ties to the smallest `key` (house rule: libm ln agrees across engines
    * to well under 4 dp), so the selected SET is engine-exact.
    * Non-positive weights are excluded (the A-ES domain); u is clamped away
    * from 0 so the 2⁻³² md5 corner cannot produce ln(0). Deterministic
    * given `key` — reprocessing or engine change reproduces the sample,
    * the [[stratifiedSample]]/[[assignSplit]] property. */
  /** The shared A-ES key: round6(-ln(max(u, 1e-12)) / w) over the house md5
    * uniform — ONE definition so the global and per-stratum draws can never
    * drift apart (both oracles mirror it verbatim). */
  private def esKey(key: Column, weight: Column): Column = {
    val u = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    round(-log(greatest(u, lit(1e-12))) / weight.cast("double"), 6)
  }

  /** The A-ES weight domain: strictly positive, and NOT NaN — Spark orders
    * NaN above every double, so a bare `w > 0` would admit a 0.0/0.0
    * upstream ratio and sort it into the tail of the sample. */
  private def validWeight(weight: Column): Column = {
    val w = weight.cast("double")
    w > 0 && !isnan(w)
  }

  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.where(validWeight(weight))
      .withColumn("__esk", esKey(key, weight))
      .orderBy(col("__esk"), key)
      .limit(k)
      .drop("__esk")
  }

  /** Domain-mix rebalancing: cap every stratum (source/domain) at `cap`
    * rows, chosen deterministically by md5 order of the key — the
    * "downweight over-represented domains" step of a corpus mix. Unlike
    * [[stratifiedSample]] (a rate, map-only) this is an exact COUNT cap, so
    * it needs per-stratum ordering: one shuffle on the stratum plus a
    * per-partition top-`cap`.
    *
    * Skew note for 100 TB: a single exact window would funnel a hot domain
    * into ONE window partition (one task sorts the whole domain). This runs
    * two phases instead: a PRE-FILTER window partitioned by
    * (input-partition id, stratum) keeps at most `cap` rows per stratum per
    * input partition — each window group is bounded by an input partition's
    * slice of the stratum, never the whole stratum — then the exact global
    * window runs over the ≤ partitions × cap survivors, so the hot-stratum
    * sort is bounded by a knob (parallelism × cap), not by the data. Spark's
    * rank-limit pushdown (InferWindowGroupLimit) additionally prunes each
    * phase to cap rows per group BEFORE its exchange (Partial
    * WindowGroupLimit — PlanSpec locks it), so neither exchange ever moves
    * more than cap rows per (group, map task).
    *
    * The result is IDENTICAL to the single-window form for any partition
    * assignment: a row in the global top-cap of its stratum is in the
    * top-cap of whatever partition slice it sits in (rank within a subset
    * ≤ rank within the whole), so phase 1 never drops a final survivor —
    * the property spec asserts this against the plain window on random
    * caps/strata. spark_partition_id() is materialised via a projection
    * first (a window cannot partition on a nondeterministic expression
    * directly), and the pre-rank uses the same (md5, key) order as the
    * exact rank. */
  def domainRebalance(df: DataFrame, key: Column, stratum: Column,
                      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    twoPhaseGroupLimit(df, stratum, Seq(md5(key.cast("string")), key), cap)
  }

  /** Per-stratum weighted sampling without replacement: [[weightedSample]]'s
    * A-ES key (-ln(u)/w over the deterministic md5 uniform, 6-dp rounded)
    * ranked WITHIN each stratum — "keep the k best documents per domain,
    * drawn ∝ weight" (the per-domain-quota step of a corpus mix, where
    * [[domainRebalance]] is the unweighted cap and [[weightedSample]] the
    * global draw). Hot-stratum safety is [[twoPhaseGroupLimit]]'s pre-cap;
    * non-positive weights are excluded as in [[weightedSample]]. */
  def weightedSamplePerStratum(df: DataFrame, key: Column, stratum: Column,
                               weight: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    twoPhaseGroupLimit(
      df.where(validWeight(weight)).withColumn("__esk", esKey(key, weight)),
      stratum, Seq(col("__esk"), key), k).drop("__esk")
  }

  /** Exact per-stratum top-`cap` by `ord` WITHOUT funnelling a hot stratum
    * into one window partition: a PRE-FILTER window over
    * (input-partition id, stratum) bounds each group by an input
    * partition's slice, then the exact global window runs over the
    * ≤ partitions × cap survivors. Output-identical to the single-window
    * form for any partition assignment (rank within a subset ≤ rank within
    * the whole, so phase 1 never drops a final survivor) — locked by
    * CurationPropertySpec. Spark's rank-limit pushdown
    * (InferWindowGroupLimit) prunes each phase to cap rows per group
    * BEFORE its exchange. */
  private def twoPhaseGroupLimit(df: DataFrame, stratum: Column,
                                 ord: Seq[Column], cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = df.withColumn("__pid", spark_partition_id())
      .withColumn("__prk", row_number().over(
        Window.partitionBy(col("__pid"), stratum).orderBy(ord: _*)))
      .where(col("__prk") <= cap)
      .drop("__pid", "__prk")
    pre.withColumn("__rk", row_number().over(
        Window.partitionBy(stratum).orderBy(ord: _*)))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Temperature-scaled mixture sampling (the multilingual/Gopher mixing
    * rule: sampling share per stratum ∝ n_s^tau, tau<1 upweights rare
    * strata): each stratum's keep-rate is
    * least(1, round(n_s^tau / Σ_t n_t^tau · targetTotal / n_s, 6)), applied
    * as the house deterministic md5-uniform filter. tau=1 reduces to plain
    * proportional downsampling; tau=0 gives every stratum an equal share.
    *
    * Scale shape: one partial-aggregated count per stratum; the rate table
    * (one row per stratum) joins back on the stratum WITHOUT a broadcast
    * hint — at web scale the "stratum" may be a domain column with millions
    * of distinct values (the tfidf vocabulary lesson), and AQE still picks
    * broadcast when the table is genuinely small. The Σ n^tau normaliser is
    * a one-row broadcast. The filter itself is per-row arithmetic. */
  def temperatureSample(df: DataFrame, key: Column, stratum: Column,
                        tau: Double, targetTotal: Long): DataFrame = {
    require(targetTotal > 0, "targetTotal must be positive")
    val counts = df.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__n"))
    val z = counts.agg(sum(pow(col("__n").cast("double"), tau)).as("__Z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col("__s"),
        least(lit(1.0), round(pow(col("__n").cast("double"), tau) / col("__Z")
          * lit(targetTotal.toDouble) / col("__n").cast("double"), 6)).as("__rate"))
    val u = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // null-safe join: a NULL stratum is a legitimate group (groupBy keeps
    // it), and a plain === would silently delete every such row
    df.join(rates, stratum <=> col("__s"))
      .where(u < col("__rate"))
      .drop("__s", "__rate")
  }

  /** Population-stability-index drift between two corpus snapshots over a
    * categorical (or pre-binned) column: per bin,
    * contrib = (p_cur − p_ref) · ln(p_cur / p_ref), with add-`alpha`
    * smoothing over the UNION of bins so a bin present on only one side
    * contributes a large-but-finite term instead of ±∞. Total PSI is the
    * sum of `psi_contrib` (< 0.1 stable, > 0.25 drifted by the usual
    * reading); per-bin rows are returned because the actionable output is
    * WHICH bins moved.
    *
    * Scale shape: one partial-aggregated count per side keyed on the bin
    * (the only row-level pass over each snapshot); everything after — the
    * full outer join, the three totals, the contribution arithmetic — runs
    * on bin-cardinality tables. */
  def psiDrift(ref: DataFrame, cur: DataFrame, refBin: Column, curBin: Column,
               alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive (zero re-introduces infinities)")
    val rc = ref.groupBy(refBin.as("__rbin")).agg(count(lit(1)).as("__nr"))
    val cc = cur.groupBy(curBin.as("__cbin")).agg(count(lit(1)).as("__nc"))
    // explicit NULL-SAFE join condition, not USING: a full-outer USING join
    // carries hidden original-column metadata that makes later references
    // ambiguous once the join is crossJoined with plans sharing its
    // lineage, and a plain === would split a null bin present on both
    // sides into two spurious one-sided drift rows
    val joined = rc.join(cc, col("__rbin") <=> col("__cbin"), "full_outer")
      .select(coalesce(col("__rbin"), col("__cbin")).as("bin"),
        col("__nr"), col("__nc"))
    // totals from the tiny bin-count aggregates (bin cardinality, never a
    // second row-level pass over the snapshots), and NOT from `joined`
    // (crossJoining a plan with an aggregate of itself is ambiguous)
    val totals = rc.agg(sum(col("__nr")).cast("double").as("__tot_r"))
      .crossJoin(cc.agg(sum(col("__nc")).cast("double").as("__tot_c")))
      .crossJoin(rc.select(col("__rbin").as("bin"))
        .unionByName(cc.select(col("__cbin").as("bin")))
        .distinct().agg(count(lit(1)).cast("double").as("__nbins")))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"),
        round(((coalesce(col("__nc"), lit(0L)).cast("double") + lit(alpha)) /
               (col("__tot_c") + lit(alpha) * col("__nbins")) -
               (coalesce(col("__nr"), lit(0L)).cast("double") + lit(alpha)) /
               (col("__tot_r") + lit(alpha) * col("__nbins"))) *
          log(((coalesce(col("__nc"), lit(0L)).cast("double") + lit(alpha)) /
               (col("__tot_c") + lit(alpha) * col("__nbins"))) /
              ((coalesce(col("__nr"), lit(0L)).cast("double") + lit(alpha)) /
               (col("__tot_r") + lit(alpha) * col("__nbins")))), 6).as("psi_contrib"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between two corpus snapshots
    * over a numeric column: D = max_v |F_ref(v) − F_cur(v)| — the
    * distribution-shape drift monitor that PSI's pre-binned form misses
    * (PSI sees category mix; KS sees any shift in a continuous quantity
    * like document length or quality score). Output: one row
    * (n_ref, n_cur, d_stat, at_val) with d_stat the 6-dp-rounded max gap
    * and at_val the SMALLEST value attaining it (round-before-argmax +
    * total tie order = engine-portable).
    *
    * Scale shape: each snapshot collapses map-side to (value, count) —
    * the only row-level passes; the cumulative counts then ride
    * [[ScanOps.cumSum]]'s two-level scan over the DISTINCT-value table
    * (the [[EvalOps.aucRoc]] discipline for the input size, plus the
    * round-13 no-single-partition-WindowExec discipline for the scan
    * itself). Arbitrary real axes have no static order-monotone bucket,
    * so the bucket interpolates between the observed min/max — a 2-row
    * broadcast (the Z-scalar pattern) computed in one extra tiny
    * aggregate; equal-min-max degenerates to one bucket, which is
    * correct, just serial. Integer counts make the two-level sum
    * bit-identical to the sequential scan the oracle replays. */
  def ksTest(ref: DataFrame, cur: DataFrame, refX: Column,
             curX: Column): DataFrame = {
    val rc = ref.select(refX.cast("double").as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__cr"))
    val cc = cur.select(curX.cast("double").as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__cc"))
    val merged = rc.join(cc, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("__cr"), lit(0L)).as("cr"),
        coalesce(col("__cc"), lit(0L)).as("cc"))
    val totals = rc.agg(sum("__cr").cast("double").as("__nr"))
      .crossJoin(cc.agg(sum("__cc").cast("double").as("__nc")))
    val bounds = merged.agg(min("v").as("__vlo"), max("v").as("__vhi"))
    // (v−lo)/(hi−lo) ∈ [0,1] exactly (IEEE division is monotone and the
    // numerator never exceeds the denominator), so floor(·63) ∈ [0,63]
    // and is non-decreasing in v — the cumSum monotonicity contract
    val bucket = when(col("__vhi") > col("__vlo"),
      floor((col("v") - col("__vlo")) / (col("__vhi") - col("__vlo")) * 63))
      .otherwise(lit(0)).cast("int")
    ScanOps.cumSum(merged.crossJoin(broadcast(bounds)),
        order = col("v"), descending = false, bucket = bucket,
        nBuckets = 64, values = Seq("cr" -> "__sr", "cc" -> "__sc"))
      .crossJoin(broadcast(totals))
      .select(col("__nr"), col("__nc"),
        round(abs(col("__sr") / col("__nr") - col("__sc") / col("__nc")), 6)
          .as("__gap"),
        col("v"))
      .agg(max(struct(col("__gap"), (-col("v")).as("__negv"))).as("__m"),
        first(col("__nr")).as("nrd"), first(col("__nc")).as("ncd"))
      .select(col("nrd").cast("long").as("n_ref"),
        col("ncd").cast("long").as("n_cur"),
        col("__m.__gap").as("d_stat"), (-col("__m.__negv")).as("at_val"))
  }

  /** Jensen–Shannon divergence between two snapshots' token unigram
    * distributions: JSD = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q), natural log —
    * bounded in [0, ln 2], symmetric, finite without smoothing (a token on
    * one side only contributes p·ln 2), which is exactly why it beats raw
    * KL as a vocabulary-drift monitor. Output: one row
    * (n_ref_tokens, n_cur_tokens, vocab_union, jsd) rounded to 6 dp.
    *
    * Scale shape: one token-count aggregate per side (corpus collapses to
    * vocabulary), a hint-free full-outer join on the token (vocabularies
    * are unbounded — never broadcast), and a one-row sum; the summands are
    * all O(p·ln 2) positives, so the 6-dp round is portable (the
    * covarianceMatrix centring lesson applied preventively). */
  def jsDivergence(ref: DataFrame, cur: DataFrame, refText: Column,
                   curText: Column): DataFrame = {
    def tokCounts(df: DataFrame, text: Column, cn: String) =
      TextOps.withTokens(df, Seq.empty, text)
        .select(explode(col("__tk")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(cn))
    val rc = tokCounts(ref, refText, "__cr")
    val cc = tokCounts(cur, curText, "__cc")
    val totals = rc.agg(sum("__cr").cast("double").as("__nr"))
      .crossJoin(cc.agg(sum("__cc").cast("double").as("__nc")))
    val joined = rc.join(cc, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("__cr"), lit(0L)).as("cr"),
        coalesce(col("__cc"), lit(0L)).as("cc"))
      .crossJoin(broadcast(totals))
    val p = col("cr").cast("double") / col("__nr")
    val q = col("cc").cast("double") / col("__nc")
    val m = (p + q) / lit(2.0)
    val contrib =
      when(col("cr") > 0, p * log(p / m)).otherwise(lit(0.0)) +
      when(col("cc") > 0, q * log(q / m)).otherwise(lit(0.0))
    joined.agg(
        first(col("__nr")).cast("long").as("n_ref_tokens"),
        first(col("__nc")).cast("long").as("n_cur_tokens"),
        count(lit(1)).as("vocab_union"),
        round(sum(contrib) / lit(2.0), 6).as("jsd"))
  }

  /** Deterministic train/val/test assignment: the md5 uniform of the key
    * against cumulative fraction boundaries. Adds a `split` column; the
    * last split absorbs any rounding remainder. Pure map — the standard
    * "split must survive reprocessing and engine changes" requirement is
    * exactly what the md5 idiom provides. */
  def assignSplit(df: DataFrame, key: Column,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val u = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
    val split = fractions.init.zip(bounds.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), b), acc) =>
      when(u < b, lit(name)).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** Deterministic corpus shuffle for training export: md5-bucket the key
    * into `numBuckets`, rank within each bucket by a second md5 order —
    * the "globally shuffled shards" step before sequence packing. One
    * shuffle on the bucket; the in-bucket window is bounded by
    * corpus/numBuckets rows, so numBuckets is the straggler knob. */
  def shuffleExport(df: DataFrame, key: Column, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numBuckets > 0, "numBuckets must be positive")
    val bucket = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % numBuckets).as("bucket")
    df.withColumn("bucket", bucket)
      .withColumn("rank", row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(md5(concat(lit("shuf:"), key.cast("string"))), key)))
  }

  /** Robust per-stratum outlier flagging via median + MAD (median absolute
    * deviation): a row is an outlier when |x − med| > k·MAD of its stratum
    * — the heavy-tail-safe alternative to mean/σ for length or score
    * distributions where a single giant document would drag a z-score
    * threshold. Output: (doc_id, stratum, x, med, mad, is_outlier); rows
    * with null `x` are excluded. MAD = 0 (over half the stratum at the
    * median) flags any deviation at all — the conventional degenerate-MAD
    * behaviour; pre-bucket such strata if that is too aggressive.
    *
    * Scale shape: two per-stratum aggregates and two joins ON the stratum
    * key, no window. `exact = true` uses the exact interpolated percentile
    * (aggregate state proportional to distinct values per stratum — fine
    * for bounded-range stats like char counts); at 100 TB with unbounded
    * value domains pass `exact = false` for approx_percentile's fixed
    * sketch state (the [[quantileBuckets]] exact/approx convention). The
    * stratum joins carry no broadcast hint — strata can be web-domain
    * cardinality; AQE will broadcast genuinely small stat tables. */
  def madOutliers(df: DataFrame, key: Column, stratum: Column, x: Column,
                  k: Double = 3.0, exact: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    def med(c: Column) =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(10000))
    val base = df
      .select(key.as("doc_id"), stratum.as("stratum"), x.cast("double").as("x"))
      .where(col("x").isNotNull)
    val m1 = base.groupBy("stratum").agg(med(col("x")).as("med"))
    val dv = base.join(m1, Seq("stratum"))
      .withColumn("__dev", abs(col("x") - col("med")))
    val m2 = dv.groupBy("stratum").agg(med(col("__dev")).as("mad"))
    dv.join(m2, Seq("stratum"))
      .select(col("doc_id"), col("stratum"), col("x"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        (col("__dev") > lit(k) * col("mad")).as("is_outlier"))
  }

  /** Per-stratum winsorization: clamp `x` to its stratum's [pLo, pHi]
    * percentile interval — the standard outlier-robust normalisation before
    * any mean/variance-sensitive downstream stage (length re-weighting,
    * score calibration). Output: (doc_id, stratum, x, lo, hi, x_wins) with
    * the bounds rounded to 6 dp BEFORE clamping, so the clamp decision
    * itself is engine-portable (the house round-before-any-float-decision
    * rule); rows with null x pass through with null x_wins.
    *
    * Scale shape: one partial-aggregated percentile pass per stratum, the
    * bounds joined back hint-free ([[madOutliers]] convention — strata can
    * be web-domain cardinality, AQE broadcasts genuinely small tables);
    * the clamp is a pure map. `exact = false` switches to approx_percentile
    * for unbounded value domains (the [[quantileBuckets]] knob). */
  def winsorize(df: DataFrame, key: Column, stratum: Column, x: Column,
                pLo: Double = 0.05, pHi: Double = 0.95,
                exact: Boolean = true): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    def pct(c: Column, p: Double) =
      if (exact) percentile(c, lit(p))
      else percentile_approx(c, lit(p), lit(10000))
    val base = df.select(key.as("doc_id"), stratum.as("stratum"),
      x.cast("double").as("x"))
    val bounds = base.where(col("x").isNotNull)
      .groupBy(col("stratum").as("__ws"))
      .agg(round(pct(col("x"), pLo), 6).as("lo"),
        round(pct(col("x"), pHi), 6).as("hi"))
    // null-safe: a NULL stratum is a legitimate group (quantileBuckets rule)
    base.join(bounds, col("stratum") <=> col("__ws"), "left")
      .drop("__ws")
      // Spark's least/greatest SKIP null inputs (they are not null-strict),
      // so an unguarded clamp would turn a null x into lo — the explicit
      // isNotNull gate is what delivers the documented null pass-through.
      .withColumn("x_wins", when(col("x").isNotNull,
        least(greatest(col("x"), col("lo")), col("hi"))))
  }

  /** Token-count histogram: bin documents by `binWidth` tokens and count.
    * One partial-aggregated shuffle on the bin id (at most a few hundred
    * distinct bins), with per-bin min/max as the bin-edge sanity columns. */
  def tokenHistogram(df: DataFrame, text: Column, binWidth: Int): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val n = size(TextOps.tokens(text))
    df.select(n.as("__n"))
      .select(floor(col("__n") / lit(binWidth)).cast("long").as("bin"), col("__n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        min(col("__n")).cast("long").as("min_tokens"),
        max(col("__n")).cast("long").as("max_tokens"))
  }
}
