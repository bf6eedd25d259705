package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline operators for large-scale training-data curation:
  * normalisation, tokenisation, shingling, language-ID, quality scoring,
  * token counting and document fingerprinting.
  *
  * Everything here is pure Catalyst expressions (codegen'd, no UDFs), so the
  * same column definitions run unchanged on a 1000-executor cluster: the only
  * shuffles are the explicit groupBys, and every scalar op stays inside
  * whole-stage codegen next to the parquet scan.
  */
object TextOps {

  /** Lowercase, strip non-alphanumerics, split on whitespace, drop empties.
    * The canonical token stream every downstream op shares.
    *
    * Deliberately lambda-free: higher-order filter() runs interpreted
    * per-element (~ms/row); collapsing separators with one regex and
    * splitting on a single space keeps the whole thing inside codegen. */
  def tokens(text: Column): Column = {
    val norm = trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
    when(norm === "", array().cast("array<string>")).otherwise(split(norm, " "))
  }

  /** Word k-shingles ("n-grams of tokens") as space-joined strings, built by
    * direct element indexing over a pre-materialised token array (a slice()
    * over an inlined tokens expression re-tokenises the text once per
    * position — O(n²) per row). Documents shorter than k yield []. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => toks(i + (o - 1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** (doc key, shingle) pairs, distinct per document. The token array is
    * materialised in its own projection so Catalyst does not inline (and
    * thus re-evaluate) the tokeniser at every shingle position. */
  def explodeShingles(df: DataFrame, key: Column, text: Column, k: Int): DataFrame =
    df.select(key.as("doc_id"), tokens(text).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("__toks"), k))).as("shingle"))

  /** Whitespace token count plus a BPE-ish subword estimate
    * (ceil(len/4) pieces per token — the usual ~4-chars-per-token rule). */
  def tokenCounts(df: DataFrame, key: Column, text: Column): DataFrame = {
    val toks = col("__toks")
    df.select(key.as("doc_id"), tokens(text).as("__toks"))
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        aggregate(toks, lit(0L),
          (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
          .as("n_subwords"))
  }

  /** Quality heuristics: char length, token count, mean token length,
    * punctuation ratio, stopword ratio — the standard cheap filters a
    * pre-training pipeline applies before anything expensive. */
  def qualityScore(df: DataFrame, key: Column, text: Column,
                   stopwords: Seq[String]): DataFrame = {
    val toks = col("__toks")
    val nChars = length(col("__text"))
    val punct = nChars - length(regexp_replace(col("__text"), "[^a-zA-Z0-9 ]", ""))
    val stopHits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    df.select(key.as("doc_id"), text.as("__text"), tokens(text).as("__toks"))
      .select(
        col("doc_id"),
        nChars.as("n_chars"),
        size(toks).as("n_tokens"),
        round((length(array_join(toks, "")).cast("long")) /
          greatest(size(toks), lit(1)).cast("double"), 4).as("mean_tok_len"),
        round(punct / greatest(nChars, lit(1)).cast("double"), 4).as("punct_ratio"),
        round(stopHits / greatest(size(toks), lit(1)).cast("double"), 4).as("stop_ratio"))
  }

  /** Tiny n-gram/stopword language-ID heuristic: score each candidate
    * language by stopword hits, pick the argmax (ties resolved by the fixed
    * candidate order). Profiles are plain data — extendable without code. */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "un", "por"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "pt" -> Seq("o", "a", "os", "de", "em", "um", "para", "com"))

  def languageId(df: DataFrame, key: Column, text: Column,
                 profiles: Seq[(String, Seq[String])] = defaultProfiles): DataFrame = {
    val toks = col("__toks")
    val scored = df.select(key.as("doc_id"), tokens(text).as("__toks")).select(
      (col("doc_id") +:
        profiles.map { case (lang, stops) =>
          size(filter(toks, t => t.isin(stops.map(lit): _*))).as(s"score_$lang")
        }): _*)
    // argmax with deterministic first-wins tie-break over the profile order:
    // the first candidate (in profile order) holding the max score wins.
    val maxScore = greatest(profiles.map(p => col(s"score_${p._1}")): _*)
    val pred = profiles.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Document fingerprint: md5 over the sorted distinct token set — a cheap
    * canonical-form hash that survives token reordering and duplication. */
  def fingerprint(df: DataFrame, key: Column, text: Column): DataFrame =
    df.select(key.as("doc_id"), tokens(text).as("__toks"))
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(col("__toks"))), " "))
          .as("fingerprint"))
}
