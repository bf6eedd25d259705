package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The crawl pipeline's real topology as ONE streaming query — three
  * stateful operators with distinct keys and state shapes chained in
  * append mode:
  *
  *   1. [[StreamDedup.urlDedup]] — canonical-URL seen-set (state: one row
  *      per distinct canonical URL in the horizon) drops re-spellings of
  *      already-frontiered pages; defines the query's ONE watermark
  *      (multi-stateful queries disallow redefinition);
  *   2. [[CrawlBudget.perHostAdmitDocsTws]] — per-host politeness
  *      admission (state: two longs per live host), the fetched payload
  *      riding through so no re-join is needed. This stage runs on
  *      `transformWithState`, whose `eventTimeColumnName` output contract
  *      is what makes a third stateful stage POSSIBLE at all:
  *      `flatMapGroupsWithState` output drops the event-time tag, so
  *      nothing watermarked can follow it — the TWS form re-declares `ts`
  *      as event time and Spark enforces at runtime that emitted rows are
  *      not older than the watermark (they never are: admission
  *      tags-and-forwards the current batch's rows; its state is
  *      counters, not rows);
  *   3. [[StreamDedup.cdcChunkDedupChained]] — shift-resistant content
  *      dedup over the ADMITTED fetches (state: one row per distinct
  *      chunk hash in the horizon), evicting by the propagated watermark,
  *      so only genuinely novel spans reach the corpus.
  *
  * `transformWithState` requires the RocksDB state store provider; the
  * other two stages run on it as well (HDFS-backed state does not
  * support the multi-column-family layout TWS state uses):
  *
  * {{{
  * spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  *   "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  * }}}
  */
object Frontier {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** urlDedup → perHostAdmitDocsTws(admitted only) → cdcChunkDedupChained,
    * one query. Input must carry `urlCol` (raw spelling, string),
    * `textCol` (the fetched body, string — in a live crawl this stage
    * sits post-fetch), and `tsCol` (timestamp). Output: (url, ts,
    * chunk_id, start_tok, n_tokens, chunk_md5) — the first sighting of
    * every novel chunk among admitted, previously-unseen pages. `url` is
    * the CANONICAL spelling (admission ran on it). All three stages share
    * `watermark` (defined once, at stage 1); null-text admitted rows
    * consume budget (a fetch is a fetch) and die at the chunker. */
  def crawlFrontier(pages: DataFrame, urlCol: String, textCol: String,
                    tsCol: String, watermark: String, windowSeconds: Int,
                    maxPerWindow: Int, k: Int = 3, divisor: Int = 8,
                    maxLen: Int = 20): DataFrame = {
    val spark = pages.sparkSession
    require(spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
        .contains("RocksDB"),
      s"crawlFrontier's admission stage runs on transformWithState, which " +
        s"needs the RocksDB state store: set " +
        s"spark.sql.streaming.stateStore.providerClass=$RocksDbProvider")
    val deduped = StreamDedup.urlDedup(pages, urlCol, tsCol, watermark)
    val admitted = CrawlBudget.perHostAdmitDocsTws(
        deduped, "canon_url", tsCol, textCol, windowSeconds, maxPerWindow)
      .where(col("admitted"))
      .select(col("url"), col("ts"), col("payload"))
    StreamDedup.cdcChunkDedupChained(admitted, "url", "payload", "ts",
      k, divisor, maxLen)
  }
}
