package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-oriented curation operators: cross-document span (chunk)
  * deduplication in the C4 style, and Gopher-style intra-document
  * repetition metrics.
  *
  * Both operate on the canonical [[TextOps.tokens]] stream, so they share
  * normalisation with every other text operator. The corpus here has no
  * newline structure, so the C4 "line" unit is a fixed-width non-overlapping
  * token chunk — the same algorithm shape (segment → global count → drop
  * non-first occurrences → reassemble), with the segmenter swapped.
  */
object RepetitionOps {

  /** (doc_id, chunk_idx, chunk) rows: non-overlapping `c`-token chunks in
    * document order, trailing partial chunk kept. Documents with no tokens
    * yield no rows. Pure map + explode — no shuffle. */
  def explodeChunks(df: DataFrame, key: Column, text: Column, c: Int): DataFrame = {
    require(c > 0, "chunk size must be positive")
    val base = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .where(size(col("__toks")) > 0)
    val nChunks = floor((size(col("__toks")) + lit(c - 1)) / lit(c)).cast("int")
    base.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          j => concat_ws(" ", slice(col("__toks"), j * c + 1, lit(c)))))
          .as(Seq("chunk_idx", "chunk")))
  }

  /** Cross-document chunk dedup (C4-style duplicated-span removal): every
    * distinct chunk string survives only at its globally-first occurrence
    * (minimal (doc_id, chunk_idx)); all other occurrences are dropped and
    * each document is reassembled from its surviving chunks in order.
    *
    * Output: (doc_id, n_chunks, n_kept, clean_text). Documents with no
    * tokens are absent (they have no chunks).
    *
    * Scale shape: one shuffle on the chunk string for the winner aggregate
    * (partial-aggregated map-side — duplicated chunks collapse before the
    * exchange), one shuffle join back on chunk (both sides already hashed
    * on it; AQE can co-locate), one shuffle on doc_id for reassembly. No
    * per-document state beyond its own chunk list, so the reassembly buffer
    * is bounded by document length — nothing global is collected.
    *
    * The first-occurrence winner is encoded as `doc_id * 2^20 + chunk_idx`
    * so both engines order identically with a single BIGINT min; documents
    * must stay under 2^20 chunks (≈ 8M tokens at c=8 — far above any
    * training document) and |doc_id| under 2^43 — fine for BIGINT surrogate
    * ids, but a hash-derived 63-bit id would overflow the product and
    * SILENTLY corrupt winner order, so both bounds raise loudly instead. */
  def chunkDedup(df: DataFrame, key: Column, text: Column, c: Int = 8): DataFrame =
    dedupFromChunks(explodeChunks(df, key, text, c))

  /** [[chunkDedup]] on CONTENT-DEFINED chunks ([[TextOps.cdcChunkRows]]):
    * the shift-resistant middle tier of the span-dedup family. A fixed
    * chunk grid misses a duplicated passage the moment anything upstream
    * shifts it by one token (a prepended header re-phases every chunk);
    * [[substrDedup]] catches any offset but pays overlapping-shingle
    * volume (k rows per token). CDC boundaries re-synchronise with content
    * a few tokens after any edit, so a shifted passage re-yields its exact
    * chunks — caught at NON-overlapping cost (≈ one row per `divisor`
    * tokens). Same winner/reassembly machinery and output schema as
    * [[chunkDedup]]. */
  def cdcChunkDedup(df: DataFrame, key: Column, text: Column, k: Int = 3,
                    divisor: Int = 8, maxLen: Int = 20): DataFrame =
    dedupFromChunks(TextOps.cdcChunkRows(df, key, text, k, divisor, maxLen))

  /** The shared winner/reassembly machinery over (doc_id, chunk_idx,
    * chunk) rows — see [[chunkDedup]] for the scale shape and the winner
    * encoding bounds. Package-visible so callers can pass a PERSISTED
    * chunk frame when the segmentation is expensive enough to not derive
    * twice (the winner aggregate and the join-back both consume it; the
    * CDC fold measured 3x off end-to-end persisted (2.17 -> 0.71 s) — cache lifecycle
    * stays with the caller, the [[boilerplate]] convention). */
  private[graft] def dedupFromChunks(ch: DataFrame): DataFrame = {
    // Direct range compare, not abs(): in non-ANSI mode abs(Long.MinValue)
    // returns Long.MinValue (< 2^43), which would slip past an abs-based
    // guard in exactly the hash-derived-id scenario it protects against.
    // Guard inverted (raise-on-true, pass otherwise) so a NULL doc_id makes
    // the condition NULL and null-propagates instead of raising.
    val enc = when(col("doc_id") < -8796093022208L ||
          col("doc_id") >= 8796093022208L, raise_error(concat(
          lit("chunkDedup: |doc_id| >= 2^43 would overflow the winner "),
          lit("encoding (use a surrogate id); doc_id = "),
          col("doc_id").cast("string"))))
        .otherwise(col("doc_id")) * lit(1048576L) +
      when(col("chunk_idx") >= 1048576,
        raise_error(lit("chunkDedup: document exceeds 2^20 chunks")))
        .otherwise(col("chunk_idx"))
    val winners = ch.groupBy("chunk").agg(min(enc).as("__w"))
    ch.join(winners, "chunk")
      .withColumn("__kept", enc === col("__w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          filter(
            array_sort(collect_list(struct(col("chunk_idx"),
              when(col("__kept"), 1).otherwise(0).as("k"), col("chunk")))),
            x => x.getField("k") === 1),
          x => x.getField("chunk"))).as("clean_text"))
  }

  /** Substring-span dedup over OVERLAPPING k-token shingles (the
    * ExactSubstr semantics of Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better", re-expressed relationally): every
    * shingle occurrence that is not its shingle's globally-first occurrence
    * (minimal (doc_id, pos)) marks the token interval [pos, pos+k) as
    * duplicated; per document the marked intervals are merged into maximal
    * disjoint spans, and the document is reassembled from the tokens no span
    * covers. Unlike [[chunkDedup]] (non-overlapping fixed chunks, C4-style),
    * this catches duplicated passages at ANY token offset.
    *
    * Output: (doc_id, n_tokens, n_spans, dup_tokens, clean_text) — merged
    * span count, tokens covered by the span union, and the surviving text.
    * Documents with no tokens are absent; documents shorter than k survive
    * whole (no shingles → no spans). Span removal is positional, exactly as
    * in the suffix-array form: a kept first occurrence can still lose tokens
    * that fall inside some OTHER duplicated occurrence's span (overlapping
    * self-repeats clip the surviving copy).
    *
    * Scale shape: one partial-aggregated shuffle on the shingle string for
    * the winner min (duplicated shingles collapse map-side), one equi-join
    * back on shingle (1:1 occurrence→winner — never a pair join), one
    * doc_id aggregate whose state is the document's own duplicated-position
    * list, one join back to the token arrays on doc_id. The span merge is a
    * linear fold over the sorted position list; clean-text assembly tests
    * each token against the MERGED spans, so its per-document cost is
    * O(len × spans) with spans ≤ len/k — worst case len²/k for a document
    * of alternating duplicated/unique runs, bounded in practice by the
    * pipeline's document-length cap. Winner order reuses [[chunkDedup]]'s
    * BIGINT encoding (and its overflow guards): |doc_id| < 2^43, positions
    * < 2^20. */
  def substrDedup(df: DataFrame, key: Column, text: Column, k: Int = 8): DataFrame =
    spanDedup(df, key, text, k, hashKey = false, op = "substrDedup")

  /** The LONG-MATCH tier of the span-dedup family (the suffix-array
    * ExactSubstr setting of Lee et al. 2021 — duplicated runs of ≥
    * `minLen` tokens, typically 50): identical semantics and output to
    * [[substrDedup]] at width `minLen`, but the dedup key that reaches the
    * shuffle is md5(shingle), not the shingle string. At k = 8 a shingle
    * row is small and [[substrDedup]] ships it directly; at minLen = 50 a
    * shingle string is ~300 bytes × one row per token position — the
    * shuffle payload, not the matching, is what breaks at corpus scale.
    * Hashing first shrinks every key to 16 bytes (O(tokens) shuffle bytes
    * instead of O(minLen × tokens)) while the shingle strings themselves
    * live only map-side inside one projection.
    *
    * Where a single-node suffix array gets O(n) total work, a columnar
    * scan pays O(minLen) per position to hash each window — the
    * [[TextOps.winnow]] trade, made deliberately: every position hashes
    * independently (embarrassingly parallel, whole-stage codegen) instead
    * of carrying sequential automaton state. No verify pass is needed:
    * md5 is 128-bit, so even 10¹² corpus positions give a ~10⁻¹⁴
    * birthday-collision probability — below any curation pipeline's
    * noise floor (a 61-bit rolling hash would NOT clear that bar and
    * would force the candidate-verify join this design avoids). */
  def longMatchDedup(df: DataFrame, key: Column, text: Column,
                     minLen: Int = 50): DataFrame =
    spanDedup(df, key, text, minLen, hashKey = true, op = "longMatchDedup")

  private def spanDedup(df: DataFrame, key: Column, text: Column, k: Int,
                        hashKey: Boolean, op: String): DataFrame = {
    require(k > 0, "shingle width must be positive")
    // run-scoped persist: the tokenized base feeds BOTH the shingle
    // occurrence derivation and the final reassembly join-back, so an
    // uncached base tokenizes the corpus twice (measured: ~40% of the
    // operator's executor CPU at sf0.1). Narrow projection (doc_id +
    // token array) caches compactly; lifecycle follows the
    // dedupFromChunks/boilerplate convention (session-scoped, Bench
    // clears per entry).
    val base = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .where(size(col("__toks")) > 0)
      .persist()
    val shingleKey =
      if (hashKey) transform(TextOps.shingles(col("__toks"), k), s => md5(s))
      else TextOps.shingles(col("__toks"), k)
    val occ = base.select(col("doc_id"),
      posexplode(shingleKey).as(Seq("pos", "__sh")))
    // Same guarded winner encoding as chunkDedup (direct range compare, not
    // abs(); raise-on-true so NULL doc_id null-propagates).
    val enc = when(col("doc_id") < -8796093022208L ||
          col("doc_id") >= 8796093022208L, raise_error(concat(
          lit(s"$op: |doc_id| >= 2^43 would overflow the winner "),
          lit("encoding (use a surrogate id); doc_id = "),
          col("doc_id").cast("string"))))
        .otherwise(col("doc_id")) * lit(1048576L) +
      when(col("pos") >= 1048576,
        raise_error(lit(s"$op: document exceeds 2^20 shingle positions")))
        .otherwise(col("pos"))
    val winners = occ.groupBy("__sh").agg(min(enc).as("__w"))
    val dups = occ.join(winners, "__sh").where(enc =!= col("__w"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("__dp"))
    // Merge sorted fixed-width intervals [p, p+k) into maximal spans.
    // Positions are strictly increasing, so a non-new-span element always
    // extends the last span's end (p > prev ⇒ p + k > last.e).
    val spans = aggregate(
      coalesce(col("__dp"), array().cast("array<int>")),
      array().cast("array<struct<s:int,e:int>>"),
      (acc, p) => {
        val last = element_at(acc, -1)
        when(size(acc) === 0 || p >= last.getField("e"),
          concat(acc, array(struct(p.as("s"), (p + lit(k)).as("e")))))
          .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(last.getField("s").as("s"), (p + lit(k)).as("e")))))
      })
    // __sp is referenced three times below; the fold is non-cheap, so
    // CollapseProject keeps this projection separate (no re-evaluation).
    base.join(dups, Seq("doc_id"), "left")
      .withColumn("__sp", spans)
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__sp")).cast("long").as("n_spans"),
        aggregate(col("__sp"), lit(0L),
          (a, sp) => a + (sp.getField("e") - sp.getField("s")).cast("long"))
          .as("dup_tokens"),
        concat_ws(" ", filter(col("__toks"), (t, i) =>
          !exists(col("__sp"), sp =>
            i >= sp.getField("s") && i < sp.getField("e"))))
          .as("clean_text"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
    * Models", §A1.1 repetition filters), per document:
    *
    *   - `tot_chars`: characters in the normalised token stream
    *     (space-joined tokens).
    *   - `top_ngram_cov`: max over `topN`-grams of (occurrences × ngram
    *     chars) / tot_chars — the character coverage of the most repeated
    *     n-gram (the paper's "fraction of characters in the most frequent
    *     n-gram", counting every occurrence).
    *   - `dup_ngram_frac`: sum over duplicated `dupN`-grams of
    *     (occurrences − 1) × ngram chars / tot_chars — characters spent
    *     repeating n-grams beyond their first occurrence. (The paper
    *     unions character positions; this is the standard occurrence-count
    *     form, which needs no interval arithmetic and is monotone in the
    *     same repetition.)
    *
    * N-grams are OVERLAPPING token shingles ([[TextOps.shingles]], counted
    * with multiplicity). Documents with no tokens are absent; documents
    * shorter than an n have 0 for that metric.
    *
    * Scale shape: two explode→partial-agg shuffles keyed on (doc_id, ngram)
    * then (doc_id) — repetitive documents collapse map-side, and no state
    * exceeds one document's distinct-ngram set. */
  def repetitionMetrics(df: DataFrame, key: Column, text: Column,
                        topN: Int = 2, dupN: Int = 5): DataFrame = {
    val base = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .where(size(col("__toks")) > 0)
      .select(col("doc_id"), col("__toks"),
        length(array_join(col("__toks"), " ")).as("__tot"))

    def ngramCounts(n: Int): DataFrame = base
      .select(col("doc_id"), explode(TextOps.shingles(col("__toks"), n)).as("ng"))
      .groupBy(col("doc_id"), col("ng"))
      .agg(count(lit(1)).as("cnt"))

    val top = ngramCounts(topN).groupBy("doc_id")
      .agg(max((col("cnt") * length(col("ng"))).cast("long")).as("__topchars"))
    val dup = ngramCounts(dupN).groupBy("doc_id")
      .agg(sum(when(col("cnt") > 1, (col("cnt") - 1) * length(col("ng")))
        .otherwise(0L)).as("__dupchars"))

    base.select(col("doc_id"), col("__tot"))
      .join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__tot").cast("long").as("tot_chars"),
        round(coalesce(col("__topchars"), lit(0L)) / col("__tot"), 6).as("top_ngram_cov"),
        round(coalesce(col("__dupchars"), lit(0L)) / col("__tot"), 6).as("dup_ngram_frac"))
  }
}
