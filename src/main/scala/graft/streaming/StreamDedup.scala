package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.DedupOps

/** Streaming near-duplicate suppression: signature-exact SimHash dedup
  * under a watermark.
  *
  * The batch near-dup path (simhash → pigeonhole blocks → verified pairs)
  * needs a self-join, which streaming cannot express without a second
  * stateful operator per block. The streaming form trades recall for a
  * single stateful op: documents whose 32-bit SimHash signatures are EQUAL
  * are deduplicated within the watermark horizon. Token-set-identical
  * variants (re-crawls with different whitespace/punctuation/casing — the
  * dominant near-dup class in a streaming ingest) collapse to the same
  * signature and are caught; a pair at Hamming distance ≥ 1 is not. Batch
  * [[graft.ext.DedupOps.simhashPairs]] over the accumulated corpus remains
  * the full-recall sweep; this operator is the cheap in-flight filter in
  * front of it.
  *
  * State is bounded by the watermark exactly as the exact-dedup path:
  * one state row per distinct signature seen within the horizon
  * (dropDuplicatesWithinWatermark semantics — eviction proven by
  * re-emission in StreamDedupSpec).
  */
object StreamDedup {

  /** Append a `simhash` column and drop signature-duplicates within the
    * watermark. The signature is [[DedupOps.simhashCol]] — bit-identical to
    * the batch [[DedupOps.simhash]] aggregate, so in-flight survivors can
    * be joined/compared against batch signatures directly.
    *
    * Rows with null text or a zero-token text are DROPPED, mirroring the
    * batch path (which filters nulls and emits no signature row for
    * token-less documents): without the guard, every null-text extraction
    * failure would share one null signature — and every punctuation-only
    * document the zero signature — and dropDuplicates would silently
    * swallow all but the first of each. Route token-less rows around this
    * operator if they must be kept. */
  def nearDupDedup(docs: DataFrame, textCol: String, tsCol: String,
                   watermark: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .where(size(graft.ext.TextOps.tokens(col(textCol))) > 0)
      .withColumn("simhash", DedupOps.simhashCol(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Crawl-frontier URL dedup: canonicalize
    * ([[graft.ext.WebOps.canonicalizeUrl]] — case, default ports,
    * fragments, tracking params, query order), then drop canonical
    * duplicates within the watermark, so the N spellings a crawl sees for
    * one page admit exactly one fetch per horizon. State is one row per
    * DISTINCT canonical URL within the watermark — the frontier "seen
    * set" with bounded memory (the [[nearDupDedup]] eviction contract);
    * null URLs are dropped (a null canonical key would swallow every
    * later null row, the nearDupDedup null-signature lesson). */
  def urlDedup(pages: DataFrame, urlCol: String, tsCol: String,
               watermark: String): DataFrame =
    graft.ext.WebOps.canonicalized(
        pages.where(col(urlCol).isNotNull), col(urlCol))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("canon_url")

  /** Streaming SHIFT-RESISTANT span dedup: content-defined chunking
    * ([[graft.ext.TextOps.cdcChunks]] — boundaries from the content, not
    * the grid, so a header insertion re-digests only the chunk containing
    * the edit) exploded per document, then chunk-hash duplicates dropped
    * within the watermark. A re-crawl that prepends boilerplate or edits
    * one paragraph emits ONLY its genuinely new chunks; every unchanged
    * span hashes identically despite the offset shift and is suppressed —
    * the property the fixed-grid / whole-document streams ([[nearDupDedup]]
    * at document granularity) fundamentally lack.
    *
    * Stateless-safe by construction: the CDC boundary fold is IN-ROW
    * (map-only — cdcChunks' one generate is allowed in append streams),
    * so the only stateful operator is the final
    * dropDuplicatesWithinWatermark — one state row per DISTINCT chunk
    * hash within the horizon, evicted exactly like the [[urlDedup]]
    * frontier. Output: (idCol, tsCol, chunk_id, start_tok, n_tokens,
    * chunk_md5) — the FIRST sighting of each chunk. Null/token-less texts
    * are dropped (the nearDupDedup null-key lesson); the watermark is
    * (re)applied to the post-explode timestamp attribute so the dedup
    * state keys off the chunk rows actually flowing. */
  def cdcChunkDedup(docs: DataFrame, idCol: String, textCol: String,
                    tsCol: String, watermark: String, k: Int = 3,
                    divisor: Int = 8, maxLen: Int = 20): DataFrame =
    graft.ext.TextOps.cdcChunks(
        docs.where(col(textCol).isNotNull),
        struct(col(idCol).as("id"), col(tsCol).as("ts")), col(textCol),
        k, divisor, maxLen)
      .select(col("doc_id.id").as(idCol), col("doc_id.ts").as(tsCol),
        col("chunk_id"), col("start_tok"), col("n_tokens"), col("chunk_md5"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("chunk_md5")

  /** [[cdcChunkDedup]] for a CHAINED position — downstream of another
    * stateful operator in the same query, where the watermark is already
    * defined upstream and redefining it is disallowed. `tsCol` must
    * arrive CARRYING the event-time tag (e.g. from
    * [[CrawlBudget.perHostAdmitDocsTws]]'s `eventTimeColumnName`
    * contract); it is threaded through the chunk derivation as a bare
    * top-level attribute ([[graft.ext.TextOps.cdcChunksKeys]]) precisely
    * so the tag survives to the final dedup. Same boundaries, digests,
    * and one-state-row-per-distinct-chunk eviction as [[cdcChunkDedup]]. */
  def cdcChunkDedupChained(docs: DataFrame, idCol: String, textCol: String,
                           tsCol: String, k: Int = 3, divisor: Int = 8,
                           maxLen: Int = 20): DataFrame =
    graft.ext.TextOps.cdcChunksKeys(
        docs.where(col(textCol).isNotNull),
        Seq(idCol -> col(idCol), tsCol -> col(tsCol)), col(textCol),
        k, divisor, maxLen)
      .dropDuplicatesWithinWatermark("chunk_md5")
}
