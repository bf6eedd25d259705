package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext._

/** Beyond-reference operators: the training-data-pipeline capability set
  * (dedup, similarity search, text analysis, multimodal plumbing, event-time
  * windows). Each query has a DuckDB oracle in [[Oracles]] unless the
  * operator is not SQL-expressible (then the driver records rows-only).
  */
object ExtQueries {

  import RefQueries.Q

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").where(col("text").isNotNull)

  val NumHashes = 12
  val NumBands = 4

  // ---- text analysis ----

  val xTokens: Q = (s, dir) =>
    TextOps.tokenCounts(docs(s, dir), col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_subwords"))

  val xQuality: Q = (s, dir) =>
    TextOps.qualityScore(docs(s, dir), col("doc_id"), col("text"),
        TextOps.defaultProfiles.head._2)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("mean_tok_len"), col("punct_ratio"), col("stop_ratio"))

  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "un", "por"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "wo", "ni", "ta"))

  val xLangId: Q = (s, dir) =>
    TextOps.languageId(docs(s, dir), col("doc_id"), col("text"), langProfiles)
      .select((col("doc_id") +:
        langProfiles.map { case (l, _) => col(s"score_$l").cast("long").as(s"score_$l") }) :+
        col("pred_lang"): _*)

  val xFingerprint: Q = (s, dir) =>
    TextOps.fingerprint(docs(s, dir), col("doc_id"), col("text"))

  // ---- dedup ----

  val xDedupExact: Q = (s, dir) =>
    DedupOps.exact(docs(s, dir), col("doc_id"), col("text"))

  private def shingleDf(s: SparkSession, dir: String): DataFrame =
    TextOps.explodeShingles(docs(s, dir), col("doc_id"), col("text"), k = 3)

  private def candidates(s: SparkSession, dir: String): DataFrame = {
    val sig = DedupOps.minhashSignature(shingleDf(s, dir), NumHashes)
    DedupOps.lshCandidates(DedupOps.lshBands(sig, NumHashes, NumBands))
  }

  val xDedupMinhash: Q = (s, dir) => candidates(s, dir)

  val xDedupJaccard: Q = (s, dir) => {
    // the shingle set and candidate pairs each feed multiple join branches;
    // persist them so the minhash DAG is computed once, not per branch
    val sh = shingleDf(s, dir).persist()
    val sig = DedupOps.minhashSignature(sh, NumHashes)
    val pairs = DedupOps.lshCandidates(
      DedupOps.lshBands(sig, NumHashes, NumBands)).persist()
    DedupOps.jaccard(pairs, sh)
  }

  val xDedupSimhash: Q = (s, dir) =>
    DedupOps.simhash(docs(s, dir), col("doc_id"), col("text"))

  val xSimhashPairs: Q = (s, dir) =>
    DedupOps.simhashPairs(
      DedupOps.simhash(docs(s, dir), col("doc_id"), col("text")), maxHamming = 3)

  // ---- embedding similarity ----

  val xEmbedTopk: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    SimilarityOps.cosineTopK(emb.where(col("vec_id") =!= 0),
      "vec_id", "embedding", q, 20)
  }

  val xEmbedNeardup: Q = (s, dir) =>
    SimilarityOps.bruteForcePairs(t(s, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.99)

  /** LSH-bucketed ANN — the 100-TB path (no SQL oracle; rows-only check). */
  val xAnnLsh: Q = (s, dir) =>
    SimilarityOps.annPairs(t(s, dir, "embeddings"),
      "vec_id", "embedding", numPlanes = 8, threshold = 0.8)

  /** IVF ANN top-k (coarse quantizer; rows-only check — recall vs the
    * brute-force oracle path is asserted in SimilaritySpec). */
  val xAnnIvf: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    SimilarityOps.ivfTopK(emb.where(col("vec_id") =!= 0), "vec_id", "embedding",
      q, k = 20, nlist = 16, nprobe = 4)
  }

  // ---- multimodal plumbing ----

  val xMmDecode: Q = (s, dir) =>
    MultimodalOps.fakeDecodeColumns(
      docs(s, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload")

  /** The mapPartitions enrichment-stage variant (same output contract as
    * xMmDecode — proves the typed stage plumbing; shares the oracle). */
  val xMmDecodeStage: Q = (s, dir) =>
    MultimodalOps.decodeStage(
      docs(s, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", MultimodalOps.FakeDecoder)

  // ---- event-time windows ----

  val xWinTumble: Q = (s, dir) =>
    EventWindows.tumbling(RefQueries.events(s, dir), col("ts"), "1 hour",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v")))
      .select(col("window_start"), col("event_type"), col("n"), col("sum_v"))

  val xWinSlide: Q = (s, dir) =>
    EventWindows.sliding(RefQueries.events(s, dir), col("ts"), "1 hour", "30 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v")))
      .select(col("window_start"), col("event_type"), col("n"), col("sum_v"))

  val xWinSession: Q = (s, dir) =>
    EventWindows.session(RefQueries.events(s, dir), col("ts"), "30 minutes",
        Seq(col("user_id")),
        Seq(count(lit(1)).as("n")))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n"))
}
