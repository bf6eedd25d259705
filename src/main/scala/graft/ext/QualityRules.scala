package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document-quality rules (Rae et al. 2021, "Scaling Language
  * Models" §A1.1 — the public rule battery every large corpus pipeline
  * reimplements): token-count bounds, mean-token-length bounds, and a
  * duplicate-token-fraction cap, plus the most-frequent-token statistic used
  * for repetition filtering.
  *
  * All rules are pure Catalyst expressions over one materialised token
  * array — no shuffle for the per-document battery, two partial-aggregated
  * shuffles for the corpus-level top-token stat.
  *
  * Portability: the keep/drop decisions are made in INTEGER arithmetic
  * (`chars*10 ≥ n*minLenTenths`, `(n-distinct)*100 ≤ n*maxDupPct`), never by
  * comparing a float ratio to a float threshold — a ratio that lands exactly
  * on the threshold would otherwise flip with last-ulp engine differences.
  * The float columns in the output are descriptive only (rounded to 4 dp).
  */
object QualityRules {

  /** Per-document rule battery. Thresholds are integer-scaled:
    * `minMeanLenTenths`/`maxMeanLenTenths` are tenths of a character,
    * `maxDupPct` is a percentage. */
  def gopherRules(df: DataFrame, key: Column, text: Column,
                  minTokens: Int = 10, maxTokens: Int = 100000,
                  minMeanLenTenths: Int = 20, maxMeanLenTenths: Int = 120,
                  maxDupPct: Int = 85,
                  tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    val toks = col("__toks")
    val metrics = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks",
        tokenizer = tokenizer)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        length(array_join(toks, "")).cast("long").as("n_tok_chars"))
    val n = col("n_tokens")
    val keep = n >= minTokens && n <= maxTokens &&
      col("n_tok_chars") * 10 >= n * minMeanLenTenths &&
      col("n_tok_chars") * 10 <= n * maxMeanLenTenths &&
      (n - col("n_distinct")) * 100 <= n * maxDupPct
    metrics.select(col("doc_id"), n, col("n_distinct"),
      round(col("n_tok_chars") / greatest(n, lit(1L)).cast("double"), 4)
        .as("mean_tok_len"),
      round((n - col("n_distinct")) / greatest(n, lit(1L)).cast("double"), 4)
        .as("dup_tok_frac"),
      (keep && n > 0).as("keep"))
  }

  /** Most-frequent token per document and the fraction of the document it
    * accounts for (the Gopher "top n-gram fraction" family at n=1). Ties
    * break to the lexicographically smallest token via min(struct(-count,
    * token)) — a plain two-level aggregation, partial-aggregated map-side,
    * instead of a per-document ranking window. */
  def topToken(df: DataFrame, key: Column, text: Column): DataFrame = {
    val t = TextOps.withTokens(df, Seq(key.as("doc_id")), text, "__toks")
      .select(col("doc_id"), explode(col("__toks")).as("tok"))
    t.groupBy("doc_id", "tok").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id").agg(
        min(struct((-col("__c")).as("nc"), col("tok").as("tok"))).as("__b"),
        sum(col("__c")).as("n_tokens"))
      .select(col("doc_id"),
        col("__b").getField("tok").as("top_tok"),
        (-col("__b").getField("nc")).as("top_cnt"),
        round((-col("__b").getField("nc")) / col("n_tokens").cast("double"), 4)
          .as("top_frac"))
  }
}
