package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext._
import graft.operators.SkewJoin

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

  // ---- unicode corpus path (multilingual fixture) ----

  /** Deterministic multilingual suffixes planted on doc_id residue
    * classes (the synthetic corpus is ASCII-only): Cyrillic with mixed
    * case, space-separated CJK, precomposed AND decomposed Latin accents
    * (NFC must unify them), German sharp-s plus an upper-cased ASCII mix.
    * Unicode-escaped so the exact code points are explicit and survive
    * any source/JSON transcoding; interpolated into BOTH engines' queries
    * so the bytes agree. */
  val MultiSuffixes: Seq[String] = Seq(
    // " Привет МИР ёлка"
    " Привет МИР" +
      " ёлка",
    // " 你好 世界 数据"
    " 你好 世界 数据",
    // " Café cafe<combining-acute> naïve" — NFC unifies the two spellings
    " Café café naïve",
    // " Größe UPPER123"
    " Größe UPPER123")

  /** Variant suffixes for [[xDedupExactUni]]: same NFC form, different
    * bytes (precomposed é/ö vs decomposed e+U+0301 / o+U+0308). */
  val UniVariantA = " café größe"
  val UniVariantB = " café größe"

  /** The multilingual corpus: [[MultiSuffixes]] appended per residue
    * class (map-side CASE — the fixture costs nothing at any scale). */
  private def multiDocs(s: SparkSession, dir: String): DataFrame = {
    val m = col("doc_id") % 11
    docs(s, dir).withColumn("mtext",
      when(m === 0, concat(col("text"), lit(MultiSuffixes(0))))
        .when(m === 1, concat(col("text"), lit(MultiSuffixes(1))))
        .when(m === 2, concat(col("text"), lit(MultiSuffixes(2))))
        .when(m === 3, concat(col("text"), lit(MultiSuffixes(3))))
        .otherwise(col("text")))
  }

  /** The unicode token stream over the multilingual fixture:
    * [[TextOps.tokensUnicode]] (NFC → lower → \p{L}\p{N} split) vs the
    * ASCII [[TextOps.tokens]], which deletes every non-Latin character
    * before downstream operators see it. n_nonlatin_chars counts the
    * non-ASCII characters that SURVIVE tokenization (zero on the ASCII
    * path by construction); the digest locks the exact token stream —
    * including that "Café" and "cafe<combining-acute>" normalize to the
    * same token. */
  val xTokensUnicode: Q = (s, dir) => {
    val toks = col("__tk")
    TextOps.withTokens(multiDocs(s, dir), Seq(col("doc_id")), col("mtext"),
        tokenizer = TextOps.tokensUnicode)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(toks).cast("long").as("n_tokens"),
        array_join(toks, " ").as("__j"))
      .select(col("doc_id"), col("n_tokens"),
        length(regexp_replace(col("__j"), "[\\x00-\\x7f]", "")).cast("long")
          .as("n_nonlatin_chars"),
        md5(col("__j")).as("tok_digest"))
  }

  /** Unicode language-ID profiles: Latin entries plus Cyrillic and CJK
    * stopword sets that only [[TextOps.tokensUnicode]] can ever match
    * (the ASCII tokenizer deletes their text first). */
  val uniProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "ru" -> Seq("привет", // привет
      "мир", "ёлка", "и"),
    "zh" -> Seq("你好", "世界", "数据"))

  /** Language-ID routed through the unicode tokenizer: residue classes 0
    * and 1 become pure Cyrillic / CJK documents, and pred_lang must flip
    * to ru / zh for them — the end-to-end proof that non-Latin text now
    * reaches the scorer (on the ASCII path their scores are all zero). */
  val xLangIdUni: Q = (s, dir) => {
    val m = col("doc_id") % 11
    val df = docs(s, dir).withColumn("mtext",
      when(m === 0, lit(MultiSuffixes(0)))
        .when(m === 1, lit(MultiSuffixes(1)))
        .otherwise(col("text")))
    TextOps.languageId(df, col("doc_id"), col("mtext"), uniProfiles,
        TextOps.tokensUnicode)
      .select((col("doc_id") +: uniProfiles.map { case (l, _) =>
        col(s"score_$l").cast("long").as(s"score_$l") }) :+
        col("pred_lang"): _*)
  }

  /** Gate-liveness sentences for the COMPOSED multilingual pipeline:
    * unlike [[MultiSuffixes]] (whose tokens are all stopwords), these mix
    * stops and content words so the per-language stop-ratio statistics are
    * FIXED, non-trivial constants at every scale factor — ru 4/7, zh 3/5
    * against [[uniProfiles]]' stop sets. */
  val UniRuSentence = "Привет мир и ёлка стоит у дома"
  val UniZhSentence = "你好 世界 数据 模型 训练"

  /** The multilingual COMPOSED curation pipeline — the x_curation_pipeline
    * shape routed end-to-end through [[TextOps.tokensUnicode]], with the
    * gate stratified by PREDICTED LANGUAGE so its statistics are live for
    * non-Latin text: tokenize ONCE (the withTokens barrier), score
    * language-ID and the union-stopword quality ratio from that one token
    * array, gate whole language strata (≥ 10 docs, 4-dp mean < 0.01
    * evicts — the `und` stratum's ratio is exactly 0, while ru/zh ride at
    * their fixture-constant 0.5714/0.6 and en at ~0.04), then draw 5 docs
    * per surviving stratum ∝ token count (A-ES under the two-phase group
    * limit). The proof this composition carries: under an ASCII-stopword
    * gate the ru/zh strata would score 0.0 and be evicted exactly like
    * `und` — with multilingual stop sets their statistics are live and
    * they survive. Stage coupling (tokenizer → langid → quality → gate →
    * sampler) is hash-checked by ONE oracle. */
  val xCurationUni: Q = (s, dir) => {
    val m = col("doc_id") % 11
    val df = docs(s, dir).withColumn("mtext",
      when(m === 0, lit(UniRuSentence))
        .when(m === 1, lit(UniZhSentence))
        .when(m === 2, concat(col("text"), lit(MultiSuffixes(2))))
        .when(m === 3, concat(col("text"), lit(MultiSuffixes(3))))
        .otherwise(col("text")))
    val toks = col("__tk")
    val sz = (c: Column) => org.apache.spark.sql.functions.size(c)
    val unionStops = uniProfiles.flatMap(_._2)
    val scored = TextOps.withTokens(df, Seq(col("doc_id")), col("mtext"),
        tokenizer = TextOps.tokensUnicode)
      .select(col("doc_id") +: (uniProfiles.map { case (l, stops) =>
        sz(filter(toks, t => t.isin(stops.map(lit): _*))).as(s"score_$l")
      } :+ sz(toks).as("__nt") :+
        round(sz(filter(toks, t => t.isin(unionStops.map(lit): _*))) /
          greatest(sz(toks), lit(1)).cast("double"), 4).as("stop_ratio")): _*)
    val maxScore = greatest(uniProfiles.map(p => col(s"score_${p._1}")): _*)
    val pred = uniProfiles.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"score_$l") === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
    val gated = CorpusOps.sourceQualityGate(
      scored.withColumn("pred_lang", pred), col("pred_lang"),
      col("stop_ratio"), minDocs = 10, minMean = 0.01)
    CorpusOps.weightedSamplePerStratum(gated, col("doc_id"), col("pred_lang"),
        greatest(col("__nt"), lit(1)), k = 5)
      .select(col("doc_id"), col("pred_lang"), col("src_mean"))
  }

  /** Exact dedup on the NFC-unified unicode token stream: two variant
    * copies of each selected document are planted with precomposed vs
    * decomposed accent spellings — different BYTES, same NFC form — and
    * must land in one content group (keep_id = the lower variant id).
    * A byte-level content hash fundamentally lacks this property; the
    * operator shape stays [[DedupOps.exact]]'s one hash-groupBy. */
  /** The NFC-variant planted corpus: every doc_id % 17 == 0 document gets
    * two extra copies suffixed with [[UniVariantA]]/[[UniVariantB]] —
    * different BYTES, same NFC form. Shared by [[xDedupExactUni]] and
    * [[xDedupMinhashUni]]. */
  private def uniVariantDocs(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val sel = base.where(col("doc_id") % 17 === 0)
    val v1 = sel.select((col("doc_id") + lit(1000000000L)).as("doc_id"),
      concat(col("text"), lit(UniVariantA)).as("text"))
    val v2 = sel.select((col("doc_id") + lit(2000000000L)).as("doc_id"),
      concat(col("text"), lit(UniVariantB)).as("text"))
    base.unionByName(v1).unionByName(v2)
  }

  val xDedupExactUni: Q = (s, dir) =>
    TextOps.withTokens(uniVariantDocs(s, dir),
        Seq(col("doc_id")), col("text"), tokenizer = TextOps.tokensUnicode)
      .select(col("doc_id"),
        md5(array_join(col("__tk"), " ")).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash-LSH candidate generation over the UNICODE shingle stream:
    * the NFC-variant copies tokenize to IDENTICAL streams, so their
    * shingle sets, signatures and every band key coincide — each planted
    * (v1, v2) pair is a GUARANTEED candidate, and v↔base pairs collide at
    * the usual near-dup rate (the copies differ from their base by two
    * appended tokens). A byte-level shingle hash would see different
    * shingles for v1 vs v2 and could only ever find them probabilistically
    * — the property NFC-first buys the banded pipeline. Same
    * signature/band/candidate machinery and scale shape as
    * x_dedup_minhash (banded, never all-pairs). */
  val xDedupMinhashUni: Q = (s, dir) => {
    val sh = TextOps.explodeShingles(uniVariantDocs(s, dir), col("doc_id"),
      col("text"), k = 3, tokenizer = TextOps.tokensUnicode)
    DedupOps.lshCandidates(DedupOps.lshBands(
      DedupOps.minhashSignature(sh, NumHashes), NumHashes, NumBands))
  }

  /** CCNet-style unigram LM scoring with the MULTILINGUAL stream on both
    * sides: the reference model trains on the en-language slice of the
    * fixture corpus (whose residue-class docs carry non-Latin suffixes, so
    * the vocabulary itself contains Cyrillic/CJK/accented tokens), and
    * every document scores through [[TextOps.tokensUnicode]] — in-vocab
    * non-Latin tokens get real probabilities, out-of-vocab ones the
    * smoothed OOV mass. On the ASCII path none of that text reaches the
    * scorer at all; here the fixture classes measurably shift avg_logp,
    * and the oracle re-derives every probability over utf8proc's NFC. */
  val xLmScoreUni: Q = (s, dir) => {
    val d = multiDocs(s, dir)
    LmOps.lmScore(d, col("doc_id"), col("mtext"),
      LmOps.unigramCounts(d.where(col("lang") === "en"), col("mtext"),
        tokenizer = TextOps.tokensUnicode),
      tokenizer = TextOps.tokensUnicode)
  }

  /** TRUE subword counts over the UNICODE token stream: non-Latin
    * characters have no piece in the fixture vocabulary, so the greedy
    * encoder's single-character fallback carries them — pieces are
    * counted, never silently dropped (on the ASCII path the tokenizer
    * deletes the text before the encoder ever sees it). */
  val xSubwordUni: Q = (s, dir) =>
    TextOps.subwordCounts(multiDocs(s, dir), col("doc_id"), col("mtext"),
        tokenizer = TextOps.tokensUnicode)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_subwords"))

  /** Byte-fallback segmentation (SentencePiece's `<0xXX>` convention)
    * over the multilingual stream: per-piece corpus counts with
    * `byteFallback = true`, so every code point with NO piece in the
    * fixture vocabulary (all the planted Cyrillic/CJK) lands as its
    * UTF-8 byte pieces — the piece space is CLOSED (vocab + 256 byte
    * tokens) whatever the corpus throws at it, the property a fixed
    * vocabulary id space needs. The oracle replays the greedy rule with
    * `hex(encode(cp))` byte expansion — utf8proc's UTF-8 encoder against
    * the JVM's, agreeing byte for byte. */
  val xBpeBytes: Q = (s, dir) =>
    TextOps.withTokens(multiDocs(s, dir), Seq(col("doc_id")), col("mtext"),
        tokenizer = TextOps.tokensUnicode)
      .select(explode(col("__tk")).as("tok"))
      .select(explode(graft.functions.TextFunctions.bpeEncode(col("tok"),
        TextOps.defaultBpeVocab, byteFallback = true)).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n"))

  /** Character-level entropy over the MULTILINGUAL stream — the quality
    * battery's last ASCII assumption closed: the split/count/entropy
    * machinery is character-set-agnostic (Spark's split("") and DuckDB's
    * string_split both step CODE POINTS over the BMP fixture), so planted
    * Cyrillic/CJK/precomposed-vs-decomposed text changes each doc's
    * distribution and the 6-dp entropy must agree cross-engine over it. */
  val xCharEntropyUni: Q = (s, dir) =>
    TextOps.charEntropy(multiDocs(s, dir), col("doc_id"), col("mtext"))

  /** The Gopher rule battery over the MULTILINGUAL stream: token counts,
    * mean token length and dup fraction computed from [[TextOps
    * .tokensUnicode]]'s stream, where mean_tok_len is CODE-POINT length on
    * both engines (Spark length() = UTF8String.numChars, DuckDB len() —
    * a byte-length implementation would price Cyrillic at 2× and CJK at
    * 3× and silently shift the keep band for non-Latin sources). */
  val xGopherUni: Q = (s, dir) =>
    QualityRules.gopherRules(multiDocs(s, dir), col("doc_id"), col("mtext"),
      minTokens = 15, maxTokens = 1000,
      minMeanLenTenths = 40, maxMeanLenTenths = 50, maxDupPct = 55,
      tokenizer = TextOps.tokensUnicode)

  /** Byte-fallback pieces flowing DOWNSTREAM — x_bpe_bytes proves the
    * `<0xXX>` segmentation at the encoder; this proves it through the
    * consumer that budgets on it: [[TextOps.subwordCounts]] with
    * `byteFallback = true` over the unicode stream (every unknown
    * Cyrillic/CJK code point costs its TRUE byte-piece count, 2-3 pieces,
    * not a flat 1 for a fallback char), packed into
    * [[CorpusOps.packSequences]]'s 512-token bins. A multilingual doc's
    * bin assignment therefore depends on the UTF-8 byte lengths of its
    * non-Latin text — the training-sequence budgeting a closed piece
    * space exists to serve. The oracle replays segmentation with
    * utf8proc's UTF-8 encoder (`hex(encode(cp))`), counts the expanded
    * byte pieces, and packs with the shared md5-bucket machinery. */
  val xBpePackBytes: Q = (s, dir) =>
    CorpusOps.packSequences(
      TextOps.subwordCounts(multiDocs(s, dir), col("doc_id"), col("mtext"),
        tokenizer = TextOps.tokensUnicode, byteFallback = true),
      col("doc_id"), col("n_subwords"), maxTokens = 512, numBuckets = 8)

  /** WET-style HTML extraction over deterministically-wrapped documents:
    * each doc is rendered into a page (heading, script+style blocks,
    * entities), extracted back, and digested — the wrap makes the op
    * oracle-checkable end-to-end without an HTML corpus. */
  val xHtmlExtract: Q = (s, dir) =>
    TextOps.extractHtmlText(
        docs(s, dir).withColumn("__page", pageOf(col("source"), col("text"))),
        col("doc_id"), col("__page"))
      .select(col("doc_id"), md5(col("extracted")).as("extract_md5"),
        length(col("extracted")).cast("long").as("n_chars"))

  /** RAG-style token chunking: 32-token windows every 24 tokens (8-token
    * overlap), chunk text digested for the compare. Map-side only. */
  val xChunks: Q = (s, dir) =>
    TextOps.chunkTokens(docs(s, dir), col("doc_id"), col("text"),
        size = 32, stride = 24)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk")).as("chunk_md5"),
        col("n_tokens"))

  /** Winnowing fingerprints (k=3 shingles, window 4). */
  val xWinnow: Q = (s, dir) =>
    TextOps.winnow(docs(s, dir), col("doc_id"), col("text"), k = 3, w = 4)

  /** Subword (BPE/WordPiece-style) segmentation of the corpus over the
    * fixture merge vocabulary — greedy longest-match per token via the
    * native expression; the oracle re-implements the rule independently
    * as a DuckDB recursive CTE over the same VALUES vocabulary, so the
    * piece-for-piece agreement is a cross-engine algorithm check. */
  val xBpeEncode: Q = (s, dir) =>
    TextOps.bpeEncodeTokens(docs(s, dir), col("doc_id"), col("text"))

  /** Rank-ordered BPE merge inference over the fixture RANKED merge table
    * — the semantics a LEARNED table carries (one left-to-right skip pass
    * per rank, in rank order), vs x_bpe_encode's greedy longest-match
    * over a flattened piece set; the two provably disagree (BpeSpec's
    * "ting" divergence). Oracle replays every rank as one non-overlapping
    * string replace over a both-sides-delimited symbol string
    * ("|t||i||n||g|"): per-symbol delimiters make the pattern "|a||b|"
    * match exactly adjacent whole symbols, and replace()'s
    * resume-after-match IS the skip semantics. */
  val xBpeMergeEncode: Q = (s, dir) =>
    TextOps.bpeApplyMerges(docs(s, dir), col("doc_id"), col("text"))

  /** BPE merge-table LEARNING as a declared, oracle-checked artifact: 8
    * Sennrich rounds over the corpus word-type table ([[TextOps
    * .bpeLearnMerges]] — per-round 1-row argmax collect, parameter-
    * bounded). The DuckDB oracle replays the identical loop UNROLLED:
    * per round, adjacent-pair counts over the delimited word strings, the
    * same (cnt DESC, left, right) argmax, and the merge applied as one
    * non-overlapping delimited replace — an independent implementation
    * agreeing on every learned rank AND its pair count. Collect-eager
    * (the PlanAudit exclusion class); plan shape locked in BpeSpec. */
  val xBpeLearn: Q = (s, dir) =>
    TextOps.bpeLearnMerges(docs(s, dir), col("text"), nMerges = 8)

  /** The whole subword pipeline as ONE artifact — learn → apply →
    * aggregate: the 8 merges learned above feed the native
    * [[graft.functions.BpeApplyMerges]] as its constructor-constant
    * table (rank-order semantics, the table's OWN semantics), and the
    * resulting corpus segmentation collapses to per-(source, piece)
    * counts. Any divergence anywhere in the chain — a different learned
    * rank, a different tie-break, a different skip pass — changes the
    * piece distribution and fails the hash compare. The oracle re-learns
    * with its unrolled CTE chain and re-applies with the delimited
    * replaces, end to end. */
  val xBpeLearnedPipeline: Q = (s, dir) => {
    import s.implicits._
    val df = docs(s, dir)
    val learned = TextOps.bpeLearnMerges(df, col("text"), nMerges = 8)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    TextOps.withTokens(df, Seq(col("source")), col("text"))
      .select(col("source"), explode(col("__tk")).as("tok"))
      .select(col("source"), explode(
          graft.functions.TextFunctions.bpeApplyMerges(col("tok"), learned))
        .as("piece"))
      .groupBy("source", "piece")
      .agg(count(lit(1)).as("n"))
  }

  /** Sequence packing driven by TRUE subword counts (not the ceil(len/4)
    * proxy): [[TextOps.subwordCounts]] into
    * [[CorpusOps.packSequences]]'s next-fit bins — the real
    * training-sequence budgeting path. */
  val xBpePack: Q = (s, dir) =>
    CorpusOps.packSequences(
      TextOps.subwordCounts(docs(s, dir), col("doc_id"), col("text")),
      col("doc_id"), col("n_subwords"), maxTokens = 512, numBuckets = 8)

  /** Tokenizer fertility by source — the subword-economics dashboard row
    * (pieces per whitespace token; a source whose fertility spikes is
    * tokenizer-hostile: code, non-Latin text, boilerplate markup).
    * In-row piece counting with `source` carried through the tokenize-once
    * barrier, ONE partial-aggregated shuffle — no join back to the corpus. */
  val xBpeFertility: Q = (s, dir) => {
    import graft.functions.TextFunctions.bpeEncode
    val sz = (c: Column) => org.apache.spark.sql.functions.size(c)
    val r = TextOps.withTokens(docs(s, dir), Seq(col("source")), col("text"))
      .select(col("source"), sz(col("__tk")).cast("long").as("__nt"),
        aggregate(transform(col("__tk"),
            t => sz(bpeEncode(t, TextOps.defaultBpeVocab))),
          lit(0L), (a, x) => a + x).as("__ns"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"),
        sum("__ns").as("n_subwords"))
    r.select(col("source"), col("n_docs"), col("n_tokens"), col("n_subwords"),
      round(col("n_subwords") / col("n_tokens").cast("double"), 4)
        .as("fertility"))
  }

  /** Content-defined chunking: md5-gated boundaries (k=3 shingle,
    * divisor 8 ⇒ ~8-token expected chunks, maxLen 20), shift-resistant
    * where fixed-stride chunking is not. All-integer decisions; the
    * oracle replays the boundary recursion exactly. */
  val xCdcChunks: Q = (s, dir) =>
    TextOps.cdcChunks(docs(s, dir), col("doc_id"), col("text"),
      k = 3, divisor = 8, maxLen = 20)

  /** Content-defined chunking over the MULTILINGUAL stream — the web
    * family's last ASCII tokenization closed: gate hashes are md5 over
    * k-shingles of UNICODE tokens, so chunk boundaries on
    * Cyrillic/CJK/NFC-variant text are deterministic and cross-engine
    * (both engines hash the identical NFC-normalized shingle bytes). The
    * fixture suffixes shift every affected document's tail boundaries,
    * which is exactly what the digests lock. */
  val xCdcChunksUni: Q = (s, dir) =>
    TextOps.cdcChunks(multiDocs(s, dir), col("doc_id"), col("mtext"),
      k = 3, divisor = 8, maxLen = 20, tokenizer = TextOps.tokensUnicode)

  /** Shift-resistant span dedup: [[RepetitionOps.cdcChunkDedup]] —
    * C4-style first-occurrence-wins over CONTENT-DEFINED chunks, catching
    * offset-shifted duplicated passages a fixed chunk grid misses, at
    * non-overlapping-chunk cost. */
  val xCdcDedup: Q = (s, dir) =>
    RepetitionOps.dedupFromChunks(
      TextOps.cdcChunkRows(docs(s, dir), col("doc_id"), col("text"),
        k = 3, divisor = 8, maxLen = 20)
        // run-scoped persist (the xDedupJaccard convention): the winner
        // aggregate and the join-back both consume the chunk rows, and the
        // CDC fold is too expensive to derive twice per scan. Measured
        // against localCheckpoint(true) r20 (local[32], back-to-back):
        // persist 1.27 s min / 0.30 xcpu_s vs checkpoint 2.58 s / 1.34
        // (x_web_pipeline 1.54 vs 2.97) — a one-shot two-branch consumer
        // has no per-round task-binary amplification, so the r19 graph
        // lesson does not transfer; cold cost is equal (both materialize
        // once: cold_s 1.65 vs min 0.47 in the r20 cold-split bench).
        .persist())

  /** URL canonicalization over deterministically-planted crawl URLs
    * (the xHtmlExtract wrap convention: the corpus has no URL column, so
    * both engines construct the same messy URL per doc and must agree on
    * its canonical form — scheme/host case, default ports, fragments,
    * tracking params, query order all exercised by doc_id-dependent
    * variants). */
  /** The planted messy-URL construction shared by x_url_canon and
    * x_host_stats (and mirrored verbatim in their oracles). */
  private def messyDocUrl: Column = concat(
    when(col("doc_id") % 3 === 0, lit("HTTP://")).otherwise(lit("HTTPS://")),
    lit("WWW."), upper(col("source")), lit(".Example.COM"),
    when(col("doc_id") % 3 === 0, lit(":80"))
      .when(col("doc_id") % 3 === 1, lit(":443")).otherwise(lit("")),
    lit("/Docs/"), col("doc_id"),
    when(col("doc_id") % 2 === 0,
      lit("?utm_source=feed&z=26&lang=")).otherwise(lit("?z=26&lang=")),
    col("lang"),
    when(col("doc_id") % 5 === 0, lit("&fbclid=abc123")).otherwise(lit("")),
    when(col("doc_id") % 4 === 0, lit("#section-2")).otherwise(lit("")))

  val xUrlCanon: Q = (s, dir) =>
    WebOps.canonicalized(
      docs(s, dir).select(col("doc_id"), messyDocUrl.as("url")), col("url"))

  /** Per-host crawl accounting over the canonicalized planted URLs:
    * every doc_id is a distinct page, so n_pages = n_fetches and
    * dup_rate = 0 per host — the formula is still corpus-derived (counts
    * come from the actual canonicalization), and the host extraction is
    * the checked surface. */
  val xHostStats: Q = (s, dir) =>
    WebOps.hostStats(
      WebOps.canonicalized(
        docs(s, dir).select(col("doc_id"), messyDocUrl.as("url")),
        col("url")),
      col("canon_url"))

  /** Sketch-backed per-host accounting ([[WebOps.hostStatsKmv]]) over
    * planted REPEATED fetches (page id = doc_id % 40, so every host sees
    * each page many times and dup_rate is non-trivial). Testdata keeps
    * every host below k, where the KMV buffer saw every distinct hash and
    * n_pages is EXACT — so the oracle is the plain exact-distinct form;
    * the above-k estimator path is WebOpsSpec's hot-host fixture. */
  val xHostStatsKmv: Q = (s, dir) =>
    WebOps.hostStatsKmv(
      docs(s, dir)
        .where(col("source").isNotNull && col("lang").isNotNull)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/p/"),
            col("doc_id") % 40, lit("?lang="), col("lang")).as("url")),
      col("url"), k = 1024)

  /** Composed WEB-CORPUS pipeline — the crawl-side counterpart of
    * x_curation_pipeline, chaining the round's web operators end-to-end:
    * plant colliding spelling variants (4 per page: case+port, tracking
    * param, fragment, query order — all canonical-equal), canonicalize
    * ([[WebOps.canonicalized]], staged), keep the FIRST fetch per
    * canonical URL (the batch frontier: one partial-aggregated min +
    * an equi-join back), CDC-chunk-dedup the survivors (shift-resistant
    * span stats), and weighted-Bernoulli-sample by length (integer-exact).
    * Scale shape: map-side canonicalization, one min aggregate + join on
    * the canonical key, the cdc-dedup shuffles over the SURVIVOR subset,
    * one scalar-broadcast max — nothing quadratic, nothing collected. */
  val xWebPipeline: Q = (s, dir) =>
    webPipeline(docs(s, dir).select(col("doc_id"), col("n_chars"),
      col("text")), TextOps.tokens)

  /** The composed web pipeline with the MULTILINGUAL stream through its
    * chunk-dedup stage: same canonicalization/first-win/stats/Bernoulli
    * chain, but the CDC chunker tokenizes NFC-first — the boundary
    * selection (and therefore n_chunks/n_kept, and through them the
    * sample's stats) depends on the non-Latin text the ASCII chunker
    * deletes. One oracle covers the whole chain, differing from
    * x_web_pipeline's ONLY in the text expression and token stream. */
  val xWebPipelineUni: Q = (s, dir) =>
    webPipeline(multiDocs(s, dir).select(col("doc_id"), col("n_chars"),
      col("mtext").as("text")), TextOps.tokensUnicode)

  private def webPipeline(d: DataFrame,
                          tokenizer: Column => Column): DataFrame = {
    val url = concat(
      when(col("doc_id") % 4 === 1, lit("HTTPS://WWW.Site.Example.COM:443"))
        .otherwise(lit("https://www.site.example.com")),
      lit("/page/"), col("doc_id") % 250,
      when(col("doc_id") % 4 === 1, lit("?b=2&a=1")).otherwise(lit("?a=1&b=2")),
      when(col("doc_id") % 4 === 2, lit("&utm_campaign=x")).otherwise(lit("")),
      when(col("doc_id") % 4 === 3, lit("#top")).otherwise(lit("")))
    val canon = WebOps.canonicalized(
      d.select(col("doc_id"), col("n_chars"), col("text"),
        url.as("url")), col("url"))
    val first = canon.groupBy("canon_url").agg(min("doc_id").as("doc_id"))
    // survivors feed the cdc dedup (twice via its persist), the stats
    // join-back, and the weight max — run-scoped persist
    val surv = canon.join(first, Seq("canon_url", "doc_id")).persist()
    val stats = RepetitionOps.dedupFromChunks(
        TextOps.cdcChunkRows(surv, col("doc_id"), col("text"),
          k = 3, divisor = 8, maxLen = 20, tokenizer).persist())
      .select(col("doc_id"), col("n_chunks"), col("n_kept"))
    CorpusOps.weightedBernoulli(
      surv.join(stats, "doc_id")
        .select(col("doc_id"), col("canon_url"), col("n_chunks"),
          col("n_kept"), col("n_chars")),
      col("doc_id"), col("n_chars"))
  }

  /** Weighted BERNOULLI sample, P(keep) = n_chars / max(n_chars) —
    * the proportional-rate complement to the fixed-k A-ES
    * [[CorpusOps.weightedSample]]; integer-exact (h·W < w·2³²), so the
    * oracle replays the identical keep set with no float anywhere. */
  val xWeightedBernoulli: Q = (s, dir) =>
    CorpusOps.weightedBernoulli(
      docs(s, dir).select(col("doc_id"), col("n_chars")),
      col("doc_id"), col("n_chars"))

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

  /** Dup-cluster resolution over the LSH candidate graph: every doc gets
    * the canonical keep-id of its connected component (min member). The
    * oracle computes the same clusters via a recursive-CTE transitive
    * closure — a deliberately different algorithm, so agreement checks the
    * propagation, not a mirror of it. */
  val xDedupClusters: Q = (s, dir) =>
    DedupOps.dupClusters(
      docs(s, dir).select(col("doc_id")),
      candidates(s, dir))

  /** Incremental cross-snapshot dedup: the doc_id % 5 == 3 slice plays the
    * new crawl increment, the rest the already-kept registry. The oracle
    * mirrors the exact LSH construction (deterministic md5 minhash), so the
    * full exact-tier + band-join + Jaccard-verify + flag assembly is
    * hash-checked. */
  val xIncrDedup: Q = (s, dir) => {
    val d = docs(s, dir)
    DedupOps.dedupAgainstRegistry(
      d.where(col("doc_id") % 5 === 3), d.where(col("doc_id") % 5 =!= 3),
      col("doc_id"), col("text"), NumHashes, NumBands, theta = 0.5)
  }

  /** Exact Jaccard-threshold join (no LSH false negatives): prefix-filtered
    * AllPairs over the 3-shingle sets. The oracle is the NAIVE exact join
    * (shared-shingle counts over every co-occurring pair) — a deliberately
    * different algorithm, so agreement checks the prefix filter's
    * completeness, not a mirror of it. */
  val xSetsimJoin: Q = (s, dir) =>
    // elems deliberately NOT persisted: measured this round (BenchSubset,
    // sf0.1), caching the exploded shingle frame makes the query 3x SLOWER
    // (3.7 -> 12.3 s; shuffle records 99.5k -> 542k) — the stats-less
    // InMemoryRelation demotes the prefix-join broadcasts to sort-merge
    // joins and the concurrent candidate branches race to fill the cache.
    // The recompute-per-branch form keeps parquet statistics visible and
    // every small side broadcast — the selfJoin scaladoc's measured call.
    SetSimJoin.selfJoin(
      shingleDf(s, dir).withColumnRenamed("shingle", "elem"), theta = 0.6)

  /** Recall of the MinHash-LSH candidate generation against the EXACT
    * Jaccard ≥ 0.6 pairs from the prefix-filtered set-similarity join —
    * the dedup family's honesty row (the ANN/PQ recall-row convention):
    * the two pair sets come from INDEPENDENT algorithms, so the ratio
    * measures the banding's real miss rate, not a self-comparison. */
  val xMinhashRecall: Q = (s, dir) => {
    // ONE persisted shingle frame feeds both the LSH candidate side and
    // the exact join's ~5 selfJoin branches (the x_setsim_join reasoning)
    val sh = shingleDf(s, dir).persist()
    val cand = DedupOps.lshCandidates(DedupOps.lshBands(
        DedupOps.minhashSignature(sh, NumHashes), NumHashes, NumBands))
      .select("doc_a", "doc_b")
    // the exact join (the dominant cost) feeds both the denominator and
    // the semi-join — run-scoped persist so it is computed once
    val exact = SetSimJoin.selfJoin(
        sh.withColumnRenamed("shingle", "elem"), theta = 0.6)
      .select("doc_a", "doc_b").persist()
    val found = exact.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_exact"), col("n_found"),
        round(col("n_found") / col("n_exact"), 4).as("recall"))
  }

  /** Sorted-neighborhood candidates: within each source, documents paired
    * with their 3 nearest length-neighbours — linear-in-n candidate
    * generation however skewed the length distribution. */
  val xSortedNbr: Q = (s, dir) =>
    graft.operators.Blocking.sortedNeighborhood(
      t(s, dir, "documents")
        .where(col("source").isNotNull && col("n_chars").isNotNull),
      col("doc_id"), col("source"), col("n_chars"), window = 4)

  /** Recall of the window-4 sorted neighbourhood against the EXACT
    * same-source |Δn_chars| ≤ 2 pairs — the blocking family's honesty
    * row. Ground truth rides a bucketized band join (probe buckets
    * ±1, never a per-source n² join); a pair matches in exactly one
    * bucket, so no dedup is needed. SN misses a true pair when more
    * than window−1 docs sit between the two lengths — the number below
    * 1.0 is that structural miss rate, which is the point. */
  val xBlockingRecall: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .where(col("source").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val snPairs = graft.operators.Blocking.sortedNeighborhood(
        d, col("doc_id"), col("source"), col("n_chars"), window = 4)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val b = d.withColumn("__bk", floor(col("n_chars") / 2))
    val probes = b
      .select(col("source"), col("doc_id").as("id_a"),
        col("n_chars").as("__la"), col("__bk"))
      .withColumn("__o", explode(sequence(lit(-1), lit(1))))
      .withColumn("__bk", col("__bk") + col("__o"))
    val exact = probes
      .join(b.select(col("source"), col("doc_id").as("id_b"),
        col("n_chars").as("__lb"), col("__bk")), Seq("source", "__bk"))
      .where(col("id_a") < col("id_b") &&
        abs(col("__la") - col("__lb")) <= 2)
      .select("id_a", "id_b").persist()
    val found = exact.join(snPairs, Seq("id_a", "id_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_exact"), col("n_found"),
        round(col("n_found") / col("n_exact"), 4).as("recall"))
  }

  /** Exact-recall R-S linkage across the same increment/registry split as
    * x_incr_dedup — the no-false-negatives alternative to its LSH near
    * tier. Oracle is again the naive cross-split join. */
  val xSetsimRs: Q = (s, dir) => {
    // NOT persisted — the x_setsim_join broadcast-demotion measurement
    val sh = shingleDf(s, dir).withColumnRenamed("shingle", "elem")
    SetSimJoin.rsJoin(sh.where(col("doc_id") % 5 === 3),
      sh.where(col("doc_id") % 5 =!= 3), theta = 0.5)
  }

  /** Asymmetric containment across the same split: increment docs whose
    * shingle sets are >= 70% swallowed by a registry doc — the
    * wrapper/quote detector Jaccard thresholds miss. Oracle is the naive
    * cross-split intersection-over-|x| join. */
  val xContainJoin: Q = (s, dir) => {
    // NOT persisted — the x_setsim_join broadcast-demotion measurement
    val sh = shingleDf(s, dir).withColumnRenamed("shingle", "elem")
    SetSimJoin.containJoin(sh.where(col("doc_id") % 5 === 3),
      sh.where(col("doc_id") % 5 =!= 3), theta = 0.7)
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

  /** JL random projection of the embeddings to 16 components via the
    * md5-derived plane matrix (the SRP planes), exploded to
    * (vec_id, comp, y) for the oracle — the deliverable is the array
    * form, a zero-shuffle codegen'd map. */
  val xRpProject: Q = (s, dir) =>
    SimilarityOps.randomProject(t(s, dir, "embeddings"), "vec_id",
        "embedding", nComponents = 16, dim = 64)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("comp", "y")))

  /** Upper-triangle covariance matrix of the embeddings — the one-shuffle
    * second-moment aggregate (in-row pair products, never a self-join of
    * the exploded table; the oracle IS that self-join). */
  val xEmbedCov: Q = (s, dir) =>
    SimilarityOps.covarianceMatrix(t(s, dir, "embeddings"), "vec_id",
      "embedding")

  /** Top-4 PCA projection, DECLARED as its distributed check surface
    * ([[SimilarityOps.pcaProjectionCheck]]): the raw (vec_id, comp, y)
    * rows are not portable SQL (the oracle has no eigen solver), so the
    * entry aggregates the exact 6-dp projection values into per-component
    * scalars with constant expected values — row count, projection mean
    * (0: centred) and |var − λ| (0: eigenvalue match) — making the
    * projection oracle-checkable end to end. PcaSpec locks the raw row
    * semantics; x_pca_invariants carries the driver-side ortho/residual/
    * order companions. */
  val xPcaProject: Q = (s, dir) =>
    SimilarityOps.pcaProjectionCheck(t(s, dir, "embeddings"), "vec_id",
      "embedding", k = 4)

  /** Closed-form PCA invariants (orthonormality, eigen residual, eigenvalue
    * order, projection mean/variance) — every expected value a constant, so
    * the oracle needs no eigen solver; this is the driver-checkable
    * companion that closes x_pca_project's verification gap. */
  val xPcaInvariants: Q = (s, dir) =>
    SimilarityOps.pcaInvariants(t(s, dir, "embeddings"), "vec_id",
      "embedding", k = 4)

  /** Robust per-source length outliers: median + MAD of n_chars per
    * source, k = 3 — the heavy-tail-safe length filter. */
  val xMadOutlier: Q = (s, dir) =>
    CorpusOps.madOutliers(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("n_chars"))

  /** Per-dimension z-score standardization of the embeddings table,
    * exploded to (vec_id, dim, z) rows for the oracle compare — the
    * deliverable is the array form ([[SimilarityOps.standardize]]'s
    * broadcast-stats map pass); the explode is presentation only. */
  val xEmbedNorm: Q = (s, dir) =>
    SimilarityOps.standardize(t(s, dir, "embeddings"), "vec_id", "embedding")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "z")))

  /** ANN/near-dup corpus with planted duplicates, so the approximate paths
    * have non-vacuous, driver-checkable output (the raw synthetic embeddings
    * contain NO pairs above 0.99 — every query over them was a 0-row pass):
    * every 25th vector gets an exact copy (vec_id+10000), and vector 0 gets
    * 20 deterministic near-clones (vec_id 20001..20020, ±0.005 md5-derived
    * jitter per element, cosine ≈ 0.9999). Everything is computed in double
    * precision after an explicit cast from the float storage, so Spark and
    * the DuckDB oracle operate on bit-identical inputs. */
  def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e0 = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val copies = e0.where(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val jitter = (j: Column, i: Column) =>
      (conv(substring(md5(concat(lit("nd:"), j.cast("string"), lit(":"),
        i.cast("string"))), 1, 8), 16, 10).cast("double")
        / lit(4294967296.0) - 0.5) * 0.01
    val clones = e0.where(col("vec_id") === 0).select(col("embedding").as("qv"))
      .crossJoin(s.range(1, 21).toDF("j"))
      .select((col("j") + 20000).as("vec_id"),
        transform(col("qv"), (x, i) => x + jitter(col("j"), i)).as("embedding"))
    // persisted: the corpus feeds several passes per query (signature +
    // verification joins; every Lloyd assignment round) and several queries
    // per run — CacheManager dedups by plan, so all of them share one copy
    e0.unionByName(copies).unionByName(clones).persist()
  }

  /** Embedding-space decontamination over the raw embeddings table:
    * vec_id % 100 == 7 stands in for the eval suite (the xContamination
    * convention); every train vector is annotated with its 6-dp max cosine
    * to any eval vector and flagged at 0.35 — map-only over a one-row
    * broadcast of the eval suite, no join. */
  val xEmbedDecontam: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val ev = emb.where(col("vec_id") % 100 === 7).select(col("embedding"))
    SimilarityOps.embedDecontaminate(
        emb.where(col("vec_id") % 100 =!= 7), "vec_id", "embedding",
        ev, "embedding")
      .select(col("vec_id"), col("max_eval_sim"),
        (col("max_eval_sim") >= 0.35).as("contaminated"))
  }

  /** Composed curation pipeline over the round-10 operators — the
    * web-corpus shape end-to-end in ONE lazy plan: render → WET extraction
    * ([[TextOps.htmlToText]], map-only) → stop-ratio quality on the
    * EXTRACTED text → source-level gate (evidence ≥ 10 docs, 4-dp mean
    * < 0.026 evicts the source) → 5 docs per surviving source drawn
    * ∝ extracted length (A-ES under the two-phase group limit). One
    * oracle covers the whole chain, so stage coupling (extraction feeding
    * the quality score feeding the gate feeding the sampler) is
    * hash-checked, not just each stage alone. */
  val xCurationPipeline: Q = (s, dir) => {
    val scored = docs(s, dir)
      .select(col("doc_id"), col("source"),
        TextOps.htmlToText(pageOf(col("source"), col("text"))).as("extracted"))
      .select(col("doc_id"), col("source"), col("extracted"),
        TextOps.tokens(col("extracted")).as("__toks"))
      .select(col("doc_id"), col("source"), col("extracted"),
        stopRatioOf(col("__toks")).as("stop_ratio"))
    val gated = CorpusOps.sourceQualityGate(scored, col("source"),
      col("stop_ratio"), minDocs = 10, minMean = 0.026)
    CorpusOps.weightedSamplePerStratum(gated, col("doc_id"), col("source"),
        length(col("extracted")), k = 5)
      .select(col("doc_id"), col("source"), col("src_mean"))
  }

  /** Exact near-dup baseline over the planted corpus — O(n²) by design; the
    * LSH/IVF paths below are the scale story, this is their ground truth. */
  val xEmbedNeardup: Q = (s, dir) =>
    SimilarityOps.bruteForcePairs(plantedEmbeddings(s, dir),
      "vec_id", "embedding", threshold = 0.99)

  /** Banded SRP-LSH ANN — the 100-TB near-dup path (16 planes × 4 bands;
    * full SRP oracle in DuckDB). */
  val xAnnLsh: Q = (s, dir) =>
    SimilarityOps.annPairs(plantedEmbeddings(s, dir),
      "vec_id", "embedding", numPlanes = 16, numBands = 4, dim = 64,
      threshold = 0.99)

  /** Corpus-sized banded SRP-LSH: bits/band derived from count(*) by
    * integer shift-and-compare (target bucket 64), so the bucket-key
    * space grows with the corpus and candidate volume stays linear —
    * the scale path; the fixed-16-plane [[xAnnLsh]] stays as the
    * documented under-sizing contrast (318x at 10x data). */
  val xAnnLshAuto: Q = (s, dir) =>
    SimilarityOps.annPairsAuto(plantedEmbeddings(s, dir),
      "vec_id", "embedding", numBands = 4, dim = 64, threshold = 0.99,
      targetBucket = 64)

  /** IVF ANN top-k with 2 Lloyd refinement rounds (coarse quantizer; full
    * IVF oracle in DuckDB). */
  val xAnnIvf: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    SimilarityOps.ivfTopK(emb.where(col("vec_id") =!= 0), "vec_id", "embedding",
      q, k = 20, nlist = 16, nprobe = 4, kmeansIters = 2)
  }

  /** Filtered ANN over the RAW embeddings table: index trained on the full
    * corpus, serve restricted to label = 1 — the one-index-many-filters
    * vector-store pattern, pre-filtered so the top-10 comes from the
    * filtered candidate set. */
  val xAnnFiltered: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    SimilarityOps.ivfTopKFiltered(emb.where(col("vec_id") =!= 0),
      "vec_id", "embedding", q, predicate = col("label") === 1,
      k = 10, nlist = 16, nprobe = 4, kmeansIters = 2)
  }

  /** Batch IVF: top-10 neighbours for EVERY vec_id%100==1 query vector in
    * one pass — one shared assignment + refinement, per-query work bounded
    * by the probed cells. */
  val xAnnIvfBatch: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    SimilarityOps.ivfTopKBatch(emb, "vec_id", "embedding", queries,
      k = 10, nlist = 16, nprobe = 4, kmeansIters = 2)
  }

  /** Batch SRP-LSH: top-10 neighbours for every vec_id%100==1 query via the
    * banded probe (one shuffle join on (band, bkey); corpus signatures
    * shared across the whole batch) — the LSH analogue of x_ann_ivf_batch.
    * The query set includes planted near-clone 20001, whose family is what
    * LSH recall is about. */
  val xAnnLshBatch: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    SimilarityOps.annTopKBatch(emb, "vec_id", "embedding", queries,
      k = 10, numPlanes = 16, numBands = 4, dim = 64)
  }

  /** Corpus-sized banded probe ([[xAnnLshBatch]] through the
    * [[SimilarityOps.annTopKBatchAuto]] sizing — corpus count drives
    * bits/band, the query set only multiplies probe fan-out linearly). */
  val xAnnLshBatchAuto: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    SimilarityOps.annTopKBatchAuto(emb, "vec_id", "embedding", queries,
      k = 10, numBands = 4, dim = 64, targetBucket = 64)
  }

  /** Batch-LSH recall@10 vs the brute-force per-query top-10, one row.
    * Unlike IVF (x_ann_recall = 1.0), banded LSH only surfaces bucket-
    * colliding neighbours — merely-similar vectors can legitimately miss —
    * so this is an honest measurement of the band geometry; the planted
    * near-dup floor is asserted separately in SimilaritySpec. */
  val xAnnLshRecall: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    val brute = SimilarityOps.cosineTopKBatch(emb, "vec_id", "embedding", queries, 10)
    val lsh = SimilarityOps.annTopKBatch(emb, "vec_id", "embedding", queries,
        k = 10, numPlanes = 16, numBands = 4, dim = 64)
      .select(col("qid"), col("vec_id").as("__f"))
    brute.join(lsh, brute("qid") === lsh("qid") && col("vec_id") === col("__f"), "left")
      .agg(count(lit(1)).as("n_true"), count(col("__f")).as("n_found"),
        round(count(col("__f")) / count(lit(1)).cast("double"), 4).as("recall"))
  }

  /** recall@10 of the CORPUS-SIZED banding vs brute force — the honesty
    * row for the auto forms: [[SimilarityOps.annTopKBatchAuto]] RAISES
    * bits/band with corpus count, explicitly trading candidate volume
    * against recall, so the recall must be measured wherever the auto
    * forms are benched (1x AND the 10x fixture), not assumed from the
    * fixed-plane row. The oracle derives the identical sizing from its
    * own count(*). */
  val xAnnLshAutoRecall: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    val brute = SimilarityOps.cosineTopKBatch(emb, "vec_id", "embedding", queries, 10)
    val lsh = SimilarityOps.annTopKBatchAuto(emb, "vec_id", "embedding",
        queries, k = 10, numBands = 4, dim = 64, targetBucket = 64)
      .select(col("qid"), col("vec_id").as("__f"))
    brute.join(lsh, brute("qid") === lsh("qid") && col("vec_id") === col("__f"), "left")
      .agg(count(lit(1)).as("n_true"), count(col("__f")).as("n_found"),
        round(count(col("__f")) / count(lit(1)).cast("double"), 4).as("recall"))
  }

  /** Recall-TARGETED auto LSH ([[SimilarityOps.annPairsAutoRecall]],
    * theta 0.9, target 0.95): one row (bits, bands, n_cand, n_true,
    * n_found, recall) — the sizing, the candidate volume it PAID, and the
    * measured pair-recall vs brute force at the same theta. Every found
    * pair is exact-verified (found ⊆ true under identical 6-dp rounding),
    * so recall = n_found/n_true, no pair join needed. The S-curve sizing
    * guarantees EXPECTED recall >= 0.95 for pairs at cosine exactly theta;
    * the fixture's true pairs sit at ~0.99 where per-band hit probability
    * is far higher, so the measured number should clear the target with
    * margin at every scale — and being a declared oracle query at both
    * SFs, a sizing regression that dropped it below target would show as
    * a changed artifact row, not a silent trade. The three 1-row
    * crossJoins are scalar-aggregate assembly, not data joins. */
  val xAnnLshRecallTarget: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val n = emb.count()
    val bits = SimilarityOps.autoBandBits(n, 64)
    val bands = SimilarityOps.recallBands(bits,
      SimilarityOps.agreeMicro(0.9), targetRecall = 0.95)
    val cand = SimilarityOps.annCandidates(emb, "vec_id", "embedding",
      numPlanes = bands * bits, numBands = bands, dim = 64)
    val found = SimilarityOps.annPairsAutoRecall(emb, "vec_id", "embedding",
      dim = 64, theta = 0.9, targetRecall = 0.95)
    val brute = SimilarityOps.bruteForcePairs(emb, "vec_id", "embedding", 0.9)
    brute.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .select(lit(bits).as("bits"), lit(bands).as("bands"), col("n_cand"),
        col("n_true"), col("n_found"),
        round(col("n_found") / col("n_true").cast("double"), 4).as("recall"))
  }

  /** Query-side recall-targeted LSH (the [[xAnnLshRecallTarget]] row's
    * batch-serve symmetric): queries are the original every-50th vectors
    * (each has a planted exact copy at +10000; vector 0 additionally its
    * 20 near-clones), sized by the same integer S-curve for recall >= 0.95
    * at cosine >= 0.9. n_true counts (query, neighbor>=theta) pairs from
    * brute force, n_found those surfaced in the per-query top-25 (k = 25
    * exceeds the largest neighbor family, so truncation cannot mask an
    * LSH miss), n_cand the candidate volume PAID for the sizing. */
  val xAnnTopkRecallTarget: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb
      .where(col("vec_id") % 50 === 0 && col("vec_id") < 10000)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("q"))
    val n = emb.count()
    val bits = SimilarityOps.autoBandBits(n, 64)
    val bands = SimilarityOps.recallBands(bits,
      SimilarityOps.agreeMicro(0.9), targetRecall = 0.95)
    val cand = SimilarityOps.annTopKBatchCandidates(emb, "vec_id",
      "embedding", queries, numPlanes = bands * bits, numBands = bands,
      dim = 64)
    val topk = SimilarityOps.annTopKBatchAutoRecall(emb, "vec_id",
      "embedding", queries, k = 25, dim = 64, theta = 0.9,
      targetRecall = 0.95)
    val qids = queries.select(col("qid"))
    val bf = SimilarityOps.bruteForcePairs(emb, "vec_id", "embedding", 0.9)
    // union-of-two-joins on purpose, NOT the one-explode symmetrization
    // (measured r20, back-to-back at local[32]): each branch's qid
    // equi-join pushes BELOW bruteForcePairs' cross join, pruning one
    // side to the ~80 query vectors (2 x 80 x n dot products), while the
    // explode form must materialize the full n^2/2 pair space first —
    // explode measured 2.63 s / 4.03 xcpu_s vs 1.52 s / 1.08 xcpu_s here.
    // "Evaluated twice" is cheaper when the duplicated subtree carries a
    // pushed-down pruning predicate the fused form loses.
    val truePairs = bf.join(qids, bf("id_a") === qids("qid"))
        .select(col("qid"), col("id_b").as("nid"))
      .unionByName(bf.join(qids, bf("id_b") === qids("qid"))
        .select(col("qid"), col("id_a").as("nid")))
    val found = truePairs
      .join(topk.select(col("qid"), col("vec_id").as("nid")), Seq("qid", "nid"))
    truePairs.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .select(lit(bits).as("bits"), lit(bands).as("bands"), col("n_cand"),
        col("n_true"), col("n_found"),
        round(col("n_found") / col("n_true").cast("double"), 4).as("recall"))
  }

  /** IVF recall vs the brute-force top-k, driver-checked: one row
    * (n_true, n_found, recall). The planted near-clones of vector 0 make the
    * true top-20 non-trivial, and recall is 1.0 by measurement (asserted
    * ≥ 0.9 in SimilaritySpec as the regression floor). */
  val xAnnRecall: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    val rest = emb.where(col("vec_id") =!= 0)
    val brute = SimilarityOps.cosineTopK(rest, "vec_id", "embedding", q, 20)
    val ivf = SimilarityOps.ivfTopK(rest, "vec_id", "embedding",
      q, k = 20, nlist = 16, nprobe = 4, kmeansIters = 2)
    brute.join(ivf.select(col("vec_id").as("__f")),
        col("vec_id") === col("__f"), "left")
      .agg(count(lit(1)).as("n_true"), count(col("__f")).as("n_found"),
        round(count(col("__f")) / lit(20.0), 4).as("recall"))
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

  /** Frame-sampling plan as a driver-checked query (was spec-only): 4
    * evenly-spaced byte offsets per payload. */
  val xMmFrames: Q = (s, dir) =>
    MultimodalOps.frameSamplePlan(
      docs(s, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", frames = 4)

  /** Aspect-preserving resize plan over the fake-decoded dimensions. */
  val xMmResize: Q = (s, dir) =>
    MultimodalOps.resizePlan(
      docs(s, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", maxW = 256, maxH = 256)

  /** Scene-change detection over 6 sampled 32-byte frame windows per
    * payload (Hamming > 8 between consecutive window aHashes) — the
    * shot-boundary frame-selection pass, in the WINDOW-FREE in-row form
    * (bit-identical to the original window form — StreamScenesSpec proves
    * it — with no Exchange and no WindowExec; also the streaming
    * surface's exact plan). Oracle replays the window hashes and the
    * unrolled 32-bit popcount. */
  val xMmScenes: Q = (s, dir) =>
    MultimodalOps.sceneChangesInRow(
      docs(s, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", frames = 6, threshold = 8)

  /** Perceptual-hash near-dup over the binary modality: aHash32 on the
    * payload bytes, pairs via the simhash pigeonhole band join. Clones
    * (doc_id % 50 == 7, id + 100000) are planted so the hamming-0 path is
    * non-vacuous; the oracle recomputes signatures independently and
    * pairs with the NAIVE quadratic join.
    *
    * Radius 1 (→ two 16-bit blocks), deliberately: byte-level aHash over
    * ASCII text is a DENSE signature space (structurally correlated bits
    * — measured: one 8-bit block value covers 27% of the sf0.1 corpus),
    * so radius-2 8-bit banding explodes to millions of candidates for a
    * 48k-pair answer. Wider blocks / tighter radius is the correct
    * banding response to signature density — real decoded-pixel aHash is
    * far better distributed and tolerates wider radii. */
  val xMmAhash: Q = (s, dir) => {
    val base = docs(s, dir).withColumn("payload", col("text").cast("binary"))
    val planted = base.select(col("doc_id"), col("payload"))
      .unionByName(base.where(col("doc_id") % 50 === 7)
        .select((col("doc_id") + 100000).as("doc_id"), col("payload")))
    // the band join references the signature frame once per (block, side);
    // unpersisted, each reference re-scans and re-hexes the payload column
    // (measured 9.5 s → 1.4 s at sf0.1) — the xDedupJaccard run-scoped
    // persist convention
    val sig = MultimodalOps.aHashSignature(planted, "doc_id", "payload")
      .withColumnRenamed("ahash", "simhash").persist()
    DedupOps.simhashPairs(sig, maxHamming = 1)
  }

  /** Deterministic payload→feature-vector extraction (dim 8), exploded to
    * one (doc_id, feat_idx, feature) row per component: the driver's
    * hash-compare sorts result columns pandas-side and an array-typed
    * column is unsortable there, so the checked surface must be scalar. */
  val xMmFeatures: Q = (s, dir) =>
    MultimodalOps.fakeFeatures(
      docs(s, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", dim = 8)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("feat_idx", "feature")))

  /** Salted skew join as a driver-checked query (was a spec-only utility):
    * events' event_type is a genuinely hot key (a handful of values over
    * the whole table), the dimension side is tiny — the exact shape AQE
    * can't always save (aggregation feeding the join). The salt must be
    * invisible in the result: the oracle is a PLAIN join. */
  val xSkewJoin: Q = (s, dir) => {
    val e = RefQueries.events(s, dir).select(col("event_id"), col("event_type"))
    val dim = e.select(col("event_type")).distinct()
      .withColumn("tag", concat(lit("#"), col("event_type")))
    SkewJoin.saltedJoin(e, dim, Seq("event_type"),
        saltSource = col("event_id"), saltFactor = 8)
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
  }

  /** Attribution-window range join: each purchase matched to every signup
    * of the SAME user whose 24 h window contains it — the point-in-interval
    * shape whose declarative form is a nested-loop. RangeJoin buckets the
    * µs axis at 1 h (≤ 25 buckets/interval) and equi-joins on
    * (user_id, bucket); the oracle is the PLAIN inequality join — the
    * bucketing is result-invariant, so what's under test is the whole
    * rewrite. PlanSpec locks the no-nested-loop plan shape. */
  val xRangeJoin: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
    val signups = e.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("w_start"),
        unix_micros(col("ts") + expr("INTERVAL 24 HOURS")).as("w_end"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts"))
    graft.operators.RangeJoin.pointInInterval(
        purchases, "p_ts", signups, "w_start", "w_end",
        bucketWidth = 3600L * 1000000L, keys = Seq("user_id"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
  }

  /** Interval-overlap join: each user's 24 h signup windows overlapping
    * their 6 h error windows — both sides bucketized, pairs deduped by the
    * first-common-bucket rule (no distinct pass). The oracle is the plain
    * inequality join; bucketing + dedup rule are result-invariant. */
  val xIntervalJoin: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
    def win(kind: String, hours: Int, idAs: String) =
      e.where(col("event_type") === kind)
        .select(col("event_id").as(idAs), col("user_id"),
          unix_micros(col("ts")).as(s"${idAs}_start"),
          unix_micros(col("ts") + expr(s"INTERVAL $hours HOURS"))
            .as(s"${idAs}_end"))
    graft.operators.RangeJoin.intervalOverlap(
        win("signup", 24, "signup_id"), "signup_id_start", "signup_id_end",
        win("error", 6, "error_id"), "error_id_start", "error_id_end",
        bucketWidth = 3600L * 1000000L, keys = Seq("user_id"))
      .select(col("signup_id"), col("error_id"), col("user_id"))
  }

  /** SCD2 history build: each user's event_type stream compacted to its
    * change points, every version carrying valid_from/valid_to/is_current —
    * the type-2 dimension the as-of join serves from. One hash exchange
    * (both windows share the (user_id; ts, event_id) spec). Timestamps go
    * out as unix micros so the hash-compare is tz-free. */
  val xScd2History: Q = (s, dir) =>
    graft.operators.ScdMerge.history(
        RefQueries.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
        keys = Seq("user_id"), ts = "ts", tiebreak = "event_id",
        attrs = Seq("event_type"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("is_current"))

  /** SCD2 incremental merge, oracle-locked by the rebuild invariant:
    * history(before cutoff) merged with the after-cutoff batch must equal
    * history(whole log) — so the oracle is x_scd2_history's SQL verbatim,
    * and what's under test is the merge path itself (close-out at the
    * first changed update, compaction of no-op updates across the
    * boundary, first-seen keys opening fresh). */
  val xScd2Merge: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val dim = graft.operators.ScdMerge.history(e.where(col("ts") < cutoff),
      Seq("user_id"), "ts", "event_id", Seq("event_type"))
    graft.operators.ScdMerge.merge(dim, e.where(col("ts") >= cutoff),
        Seq("user_id"), "ts", "event_id", Seq("event_type"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("is_current"))
  }

  /** SCD2 time travel: the dimension snapshot at a fixed instant — build
    * the history, filter to the covering version (≤ 1 row/key). The
    * oracle reconstructs the same snapshot as a per-key argmax over the
    * raw log, so what's cross-checked is that interval cover ≡ latest
    * state at T. */
  val xScd2Snapshot: Q = (s, dir) => {
    val at = lit("2024-01-16 00:00:00").cast("timestamp")
    graft.operators.ScdMerge.snapshotAt(
        graft.operators.ScdMerge.history(
          RefQueries.events(s, dir)
            .select(col("user_id"), col("event_type"), col("ts"),
              col("event_id")),
          Seq("user_id"), "ts", "event_id", Seq("event_type")),
        at)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("valid_from")).as("valid_from_us"))
  }

  /** BM25 top-20 for a fixed three-term query over the corpus: the
    * map-side term filter keeps everything after the one full scan
    * query-term-sized (df and corpus stats ride broadcasts, top-k is an
    * ordered limit). */
  val xBm25: Q = (s, dir) =>
    CorpusOps.bm25TopK(docs(s, dir), col("doc_id"), col("text"),
      queryTerms = Seq("join", "vector", "window"), k = 20)

  /** Hybrid retrieval by reciprocal-rank fusion: the BM25 top-20 fused
    * with a total-hit-count top-20 over the same query terms — two
    * rankings with incomparable score scales combined on ranks alone.
    * Both member rankings are deterministic (round-before-rank scores,
    * doc_id ties), so the fused list is too. */
  val xRrf: Q = (s, dir) => {
    val terms = Seq("join", "vector", "window")
    val w = org.apache.spark.sql.expressions.Window
    val bm = CorpusOps.bm25TopK(docs(s, dir), col("doc_id"), col("text"),
        terms, k = 20)
      .select(col("doc_id"), row_number().over(
        w.orderBy(col("bm25").desc, col("doc_id").asc)).as("rank"))
    val hits = TextOps.withTokens(docs(s, dir), Seq(col("doc_id")), col("text"))
      .select(col("doc_id"), explode(col("__tk")).as("tok"))
      .where(col("tok").isin(terms.map(lit): _*))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), row_number().over(
        w.orderBy(col("n_hits").desc, col("doc_id").asc)).as("rank"))
    CorpusOps.rrfFuse(Seq(bm, hits), topK = 20)
  }

  /** Top-20 adjacent-bigram collocations by PMI (count ≥ 5): map-side pair
    * construction, partial-aggregated counts, minCount tail prune below
    * the unigram joins. */
  val xPmi: Q = (s, dir) =>
    CorpusOps.pmiCollocations(docs(s, dir), col("text"), minCount = 5, k = 20)

  /** Z-order layout: events bucketed on (user_id, value), Morton-coded,
    * range-partitioned+sorted on the code (the multi-dimensional
    * clustering pass that makes file min-max stats prunable on BOTH
    * dims). The emitted rows are layout-invariant — the oracle recomputes
    * the same interleave arithmetic — so what's hash-checked is the
    * Morton code and what's benched is the real repartition. */
  val xZorder: Q = (s, dir) => {
    val e = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_id"),
        pmod(col("user_id"), lit(16)).as("ub"),
        least(floor(col("value") / 32).cast("long"), lit(15L)).as("vb"))
    LayoutOps.zorderRepartition(e, Seq(col("ub"), col("vb")), bits = 4,
        numPartitions = 8)
      .withColumn("zval", LayoutOps.zValue(Seq(col("ub"), col("vb")), 4))
  }

  /** Row-level sessionization: every event tagged with its per-user
    * session ordinal (30 min inactivity gap) — the gaps-and-islands
    * assignment downstream funnels join on. Two windows, one exchange
    * (the ScdMerge pattern). */
  val xSessionize: Q = (s, dir) =>
    EventWindows.sessionize(
        RefQueries.events(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us")),
        keys = Seq(col("user_id")), tsMicros = col("ts_us"),
        tiebreak = col("event_id"), gapMicros = 30L * 60 * 1000000)
      .select(col("event_id"), col("user_id"), col("session_id"))

  /** Trailing 1 h per-user moving average of `value`: a RANGE frame on the
    * µs axis — one pass per key group, never a self-join against the
    * window. */
  val xRolling: Q = (s, dir) =>
    EventWindows.rolling(
        RefQueries.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"),
            unix_micros(col("ts")).as("ts_us")),
        keys = Seq(col("user_id")), tsMicros = col("ts_us"),
        windowMicros = 3600L * 1000000, agg = avg, value = col("value"))
      .select(col("event_id"), col("user_id"),
        round(col("rolling"), 4).as("avg_1h"))

  /** Per-user burst detection: events > 2σ from the user's own trailing
    * 7-day baseline (≥ 5 events of evidence). One exchange — the three
    * rolling stats share the window spec. */
  val xAnomaly: Q = (s, dir) =>
    EventWindows.burstAnomalies(
        RefQueries.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"),
            unix_micros(col("ts")).as("ts_us")),
        keys = Seq(col("user_id")), tsMicros = col("ts_us"),
        value = col("value"), windowMicros = 7L * 86400 * 1000000,
        minN = 5, zThresh = 2.0)
      .select(col("event_id"), col("user_id"), col("z"))

  /** Nearest-in-time join: each purchase matched to the CLOSEST signup of
    * its user in either direction (ties to the earlier), carrying the
    * signup's ts and value — the sensor-alignment complement to the
    * backward-only as-of family, same one-exchange union-merge shape. */
  val xAsofNearest: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
    val build = e.where(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("tu"), col("value"))
      .groupBy(col("user_id"), col("tu"))
      .agg(max(col("value")).as("v_value"))
      .withColumn("v_ts_us", col("tu"))
    val probe = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tu"))
    graft.operators.AsOfJoin.nearest(probe, build, "user_id", "tu",
      Seq("v_ts_us", "v_value"))
  }

  /** Trending: top-2 event types per hour by count — the windowed
    * heavy-hitter report. The rank window runs over the (hour × type)
    * AGGREGATE (25 rows/bucket max), never raw events; ties break
    * lexicographically so the top-k set is engine-exact. */
  val xTrending: Q = (s, dir) => {
    val agg = EventWindows.tumbling(RefQueries.events(s, dir), col("ts"),
        "1 hour", Seq(col("event_type")), Seq(count(lit(1)).as("n")))
      .select(unix_micros(col("window_start")).as("hour_us"),
        col("event_type"), col("n"))
    // asc_nulls_last: DuckDB's default ASC puts NULLs last, Spark's first —
    // a null type tying at the top-k boundary would otherwise rank
    // differently per engine
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_us"))
      .orderBy(col("n").desc, col("event_type").asc_nulls_last)
    agg.withColumn("rank", row_number().over(w)).where(col("rank") <= 2)
  }

  /** Mergeable OLS trend per event type: x = days since the corpus epoch
    * (re-based near zero so the sums-based normal equation stays
    * cancellation-benign), y = value; state built on the even/odd halves,
    * merged, finalized — the oracle computes the same closed form from
    * the whole log, so agreement checks merge invariance. */
  val xTrend: Q = (s, dir) => {
    import graft.operators.IncrementalAgg
    val e = RefQueries.events(s, dir).select(col("event_id"),
      col("event_type"),
      ((unix_micros(col("ts")) - lit(1704067200000000L)) / 86400000000.0)
        .as("x"),
      col("value"))
    val keys = Seq("event_type")
    def st(pred: Column) =
      IncrementalAgg.trendState(e.where(pred), keys, col("x"), col("value"))
    IncrementalAgg.trendFinalize(IncrementalAgg.trendMerge(
      st(col("event_id") % 2 === 0), st(col("event_id") % 2 =!= 0), keys),
      keys)
  }

  /** Mergeable histogram-quantile sketch: state built on the even/odd
    * event_id halves SEPARATELY, merged, then finalized — the oracle
    * computes the estimate directly from the whole log's binned counts,
    * so agreement checks the split-merge invariance end-to-end, not a
    * mirror of the split. Domain [0, 600), 120 bins (width 5). */
  val xHistQuantile: Q = (s, dir) => {
    import graft.operators.HistogramSketch
    val e = RefQueries.events(s, dir)
    val keys = Seq("event_type")
    def st(pred: Column) = HistogramSketch.state(
      e.where(pred), keys, col("value"), lo = 0.0, hi = 600.0, nBins = 120)
    val merged = HistogramSketch.merge(
      st(col("event_id") % 2 === 0), st(col("event_id") % 2 =!= 0), keys)
    HistogramSketch.quantiles(merged, keys, lo = 0.0, hi = 600.0,
      nBins = 120, qs = Seq(0.5, 0.9, 0.99))
  }

  /** Exponentially decayed popularity per event type: ref pinned to the
    * end of the corpus month (2024-01-31 UTC, injected like Broadcaster's
    * `now`), half-life 7 days — one partial-aggregated shuffle, mergeable
    * by addition. */
  val xDecay: Q = (s, dir) =>
    EventWindows.decayedScore(RefQueries.events(s, dir),
      Seq(col("event_type")), unix_micros(col("ts")), col("value"),
      refMicros = 1706659200000000L, halfLifeMicros = 604800000000L)

  /** Item-item co-visitation cosine over (user, event_type): pairs built
    * in-place from each user's sorted distinct-item array, never a
    * self-join of the (user, item) table; the oracle IS that self-join —
    * a deliberately different algorithm. */
  val xCovisit: Q = (s, dir) =>
    FunnelOps.coVisitation(
      RefQueries.events(s, dir).where(col("user_id").isNotNull),
      col("user_id"), col("event_type"))

  /** The event-transition link graph shared by the graph queries: nodes
    * are `props.k` page ids, edges each user's consecutive (k → next k)
    * transitions in (ts, event_id) order. */
  private def transitionEdges(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    RefQueries.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("user_id").isNotNull && col("k").isNotNull)
      .select(col("k").as("src"), lead(col("k"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull)
  }

  /** PageRank over the transition graph: five fixed power-method rounds
    * at damping 0.85 — the oracle unrolls the identical recurrence, so
    * agreement proves the relational iteration (edge ⋈ ranks on src,
    * partial-agg on dst, broadcast dangling mass), not just the shape. */
  val xPagerank: Q = (s, dir) =>
    GraphOps.pageRank(transitionEdges(s, dir), col("src"), col("dst"),
      iters = 5, damping = 0.85)

  /** Per-node triangle counts on the undirected transition graph — the
    * degree-ordered wedge form; the oracle is the naive id-ordered 3-way
    * self-join, a deliberately different algorithm. */
  val xTriangles: Q = (s, dir) =>
    GraphOps.triangleCount(transitionEdges(s, dir), col("src"), col("dst"))

  /** 3-core of the transition graph after 5 peel rounds — surviving
    * nodes with their within-core degree; oracle unrolls the identical
    * peel. */
  val xKcore: Q = (s, dir) =>
    GraphOps.kCore(transitionEdges(s, dir), col("src"), col("dst"), k = 3,
      rounds = 5)

  /** Synchronous label-propagation communities (3 rounds) on the
    * transition graph — oracle unrolls the identical vote/argmax
    * recurrence. */
  val xLabelProp: Q = (s, dir) =>
    GraphOps.labelPropagation(transitionEdges(s, dir), col("src"),
      col("dst"), iters = 3)

  /** Connected components (5 hash-min rounds) on the transition graph —
    * oracle unrolls the identical min-propagation recurrence. */
  val xConcomp: Q = (s, dir) =>
    GraphOps.connectedComponents(transitionEdges(s, dir), col("src"),
      col("dst"), rounds = 5)

  /** EXACT connected components (pointer-jumping to fixpoint) — the output
    * is the component-min labelling itself, so the oracle verifies it by
    * recursive-CTE transitive closure instead of replaying rounds. */
  val xConcompExact: Q = (s, dir) =>
    GraphOps.connectedComponentsExact(transitionEdges(s, dir), col("src"),
      col("dst"))

  /** Deterministic random walks (2 per node, 5 steps, md5 neighbour
    * choice) on the transition graph — the DeepWalk corpus generator; the
    * oracle replays every step from the same md5 arithmetic. */
  val xRandomWalk: Q = (s, dir) =>
    GraphOps.randomWalks(transitionEdges(s, dir), col("src"), col("dst"),
      steps = 5, walksPerNode = 2)

  /** ROC-AUC of the fastText-shaped classifier score against the
    * lang = 'en' label — the one-pass Mann-Whitney eval over the scored
    * corpus (sklearn's roc_auc_score as relational algebra). */
  val xAuc: Q = (s, dir) =>
    EvalOps.aucRoc(scoredDocs(s, dir), col("score"), col("lang") === "en")

  /** PR-AUC (average precision, threshold-step form) of the same scored
    * corpus — the imbalance-honest companion to x_auc. */
  val xPrAuc: Q = (s, dir) =>
    EvalOps.averagePrecision(scoredDocs(s, dir), col("score"),
      col("lang") === "en")

  /** Brier score of the classifier probability against the en label —
    * the proper scoring rule x_calibration bins feed into. */
  val xBrier: Q = (s, dir) =>
    EvalOps.brierScore(scoredDocs(s, dir), col("score"),
      col("lang") === "en")

  /** Local clustering coefficients on the transition graph — triangles
    * joined with degrees; zero-triangle nodes included. */
  val xClusteringCoef: Q = (s, dir) =>
    GraphOps.clusteringCoefficient(transitionEdges(s, dir),
      col("src"), col("dst"))

  /** Character-distribution entropy per document — the gibberish /
    * repetition band signal. */
  val xCharEntropy: Q = (s, dir) =>
    TextOps.charEntropy(docs(s, dir), col("doc_id"), col("text"))

  /** Luhn checksum validation over deterministic 16-digit candidates
    * derived from the orders keys — the card-number false-positive filter
    * ([[TextOps.luhnValid]]); ~10% of candidates pass, so both branches
    * are exercised. */
  val xPiiLuhn: Q = (s, dir) => {
    val cand = lpad((col("o_orderkey").cast("long") * 100003 +
      col("o_custkey")).cast("string"), 16, "1")
    t(s, dir, "orders")
      .select(col("o_orderkey"), cand.as("candidate"))
      .select(col("o_orderkey"), col("candidate"),
        TextOps.luhnValid(col("candidate")).as("luhn_valid"))
  }

  /** Per-column profile of the orders table — nulls + cardinality in ONE
    * scan (multi-distinct via a single Expand), unpivoted with stack. */
  val xProfile: Q = (s, dir) =>
    DataQualityOps.profile(t(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))

  /** Declarative data-quality gate: scan-aggregate constraints in one
    * pass plus the referential-integrity anti-join, one row per
    * constraint. All-zero violations = the gate passes (and the oracle
    * proving the zeros is the point — the checks themselves are what's
    * under test). */
  val xDqCheck: Q = (s, dir) => {
    import DataQualityOps._
    check(t(s, dir, "orders"), Seq(
      NotNull("o_custkey"),
      UniqueKey("o_orderkey"),
      InRange("o_totalprice", 0.0, 1000000.0)))
      .unionByName(checkForeignKey(t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
  }

  /** The deterministic classifier fixture: weight table + scoring call —
    * ONE definition so x_lin_classify and the eval queries (and their
    * shared SCORED_CTES oracle front) can never drift apart. */
  private[queries] def classifierScores(s: SparkSession, dir: String): DataFrame = {
    val weights = s.range(1024).select(col("id").as("bucket"),
      (((col("id") * 37 + 11) % 201 - 100) / 100.0).as("weight"))
    LmOps.hashedLinearScore(docs(s, dir), col("doc_id"), col("text"),
      weights, bias = -0.05)
  }

  /** The classifier's scored corpus joined with the lang label — shared
    * by the eval queries. */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame =
    classifierScores(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .where(col("lang").isNotNull)

  /** Per-source ROC-AUC — the slice view of x_auc (single-class sources
    * yield null auc rather than vanishing). */
  val xAucStratum: Q = (s, dir) => {
    val scored = classifierScores(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("lang"), col("source")),
        "doc_id")
      .where(col("lang").isNotNull && col("source").isNotNull)
    EvalOps.aucRocByStratum(scored, col("source"), col("score"),
      col("lang") === "en")
  }

  /** Confusion matrix + precision/recall/F1 at threshold 0.5 — one scan
    * aggregate over the scored corpus. */
  val xConfusion: Q = (s, dir) =>
    EvalOps.confusionAtThreshold(scoredDocs(s, dir), col("score"),
      col("lang") === "en", threshold = 0.5)

  /** Reliability-diagram bins (10 equal-width cells over [0,1]) for the
    * classifier score against the lang label. */
  val xCalibration: Q = (s, dir) =>
    EvalOps.calibrationBins(scoredDocs(s, dir), col("score"),
      col("lang") === "en", bins = 10)

  /** Boolean AND retrieval: documents containing ALL query terms, with
    * their total hit count — the posting-list-intersection complement to
    * x_bm25's scored ranking. The term filter is map-side below the
    * explode; everything after is query-term-sized. */
  val xBoolAnd: Q = (s, dir) => {
    val terms = Seq("join", "vector", "window")
    TextOps.withTokens(docs(s, dir), Seq(col("doc_id")), col("text"))
      .select(col("doc_id"), explode(col("__tk")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_terms"),
        count(lit(1)).as("n_hits"))
      .where(col("n_terms") === terms.size)
      .select(col("doc_id"), col("n_hits"))
  }

  /** Exact phrase retrieval: positional-posting phrase-AND for a 3-token
    * phrase planted by the corpus template; the oracle is a direct
    * sliding-window scan over each doc's token list — a deliberately
    * different algorithm, so agreement checks the anchor-vote construction
    * end-to-end. */
  val xPhrase: Q = (s, dir) =>
    CorpusOps.phraseSearch(docs(s, dir), col("doc_id"), col("text"),
      Seq("slow", "hash", "batch"))

  /** Hourly LOCF resampling: each user's event stream regularised onto an
    * hourly grid (their own [first, last] hour span), every grid point
    * carrying the last value at or before the hour's end — the
    * gap-filling pass that turns an irregular event stream into a
    * time-series feature table. Composes sequence+explode (grid,
    * map-side) with the [[graft.operators.AsOfJoin]] operator (one
    * sorted-merge window pass); ties at an instant are pre-collapsed to
    * max(value) so the as-of pick is total. The first grid point of a
    * user is the end of their first event's hour, so LOCF never emits a
    * null. */
  val xResample: Q = (s, dir) => {
    val hUs = 3600L * 1000000
    val e = RefQueries.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"), col("value"))
    val build = e.groupBy(col("user_id"), col("tu"))
      .agg(max(col("value")).as("v_value"))
      .withColumnRenamed("tu", "ts_us")
    val grid = e.groupBy("user_id")
      .agg(floor(min(col("tu")) / hUs).cast("long").as("h0"),
        floor(max(col("tu")) / hUs).cast("long").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      .withColumn("ts_us", (col("hr") + 1) * hUs - 1)
    graft.operators.AsOfJoin.asOf(grid, build, "user_id", "ts_us",
        Seq("v_value"))
      .select(col("user_id"), col("hr"), col("v_value").as("locf_value"))
  }

  /** Incremental aggregate maintenance, oracle-locked by the rebuild
    * invariant: per-key mergeable state built separately before/after a
    * cutoff, merged, finalized — must equal the direct aggregate over the
    * whole log. */
  val xAggMerge: Q = (s, dir) => {
    // the metric is integer-valued (cents): integer-valued doubles sum
    // EXACTLY in any order, so split-vs-direct and Spark-vs-DuckDB land on
    // the identical double and the 4-dp round can never straddle a
    // boundary (a 2-decimal metric's partial sums differ in the last ulp
    // between engines, which flips round() exactly at the .00005 edges)
    val e = RefQueries.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"),
        round(col("value") * 100).as("cents"))
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val keys = Seq("user_id", "event_type")
    val st = graft.operators.IncrementalAgg.merge(
      graft.operators.IncrementalAgg.state(
        e.where(col("ts") < cutoff), keys, col("cents")),
      graft.operators.IncrementalAgg.state(
        e.where(col("ts") >= cutoff), keys, col("cents")),
      keys)
    graft.operators.IncrementalAgg.finalize(st, keys)
  }

  /** Ordered funnel signup → click → purchase: per-stage min-aggregate
    * before each key-equi-join — never an event-table self-join on a time
    * inequality. */
  val xFunnel: Q = (s, dir) =>
    FunnelOps.funnel(
        RefQueries.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_type")),
        key = col("user_id"), tsMicros = col("ts_us"),
        etype = col("event_type"),
        steps = Seq("signup", "click", "purchase"))
      .select(col("k").as("user_id"), col("t1"), col("t2"), col("t3"),
        col("depth"))

  /** Weekly cohort retention over epoch week indexes (calendar-free). */
  val xRetention: Q = (s, dir) =>
    FunnelOps.retention(
      RefQueries.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us")),
      key = col("user_id"), tsMicros = col("ts_us"))

  /** First-order event-type transition matrix with row-normalised
    * probabilities (lag pairing = one window; normalisation over the
    * types² aggregate only). */
  val xTransition: Q = (s, dir) =>
    FunnelOps.transitions(
      RefQueries.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type")),
      key = col("user_id"), tsMicros = col("ts_us"),
      tiebreak = col("event_id"), etype = col("event_type"))

  /** Rollup aggregate (event_type, cohort) → subtotals → grand total in
    * one pass — Spark plans ROLLUP as a single Expand+aggregate, not
    * three scans. */
  val xRollup: Q = (s, dir) =>
    RefQueries.events(s, dir)
      .select(col("event_type"), pmod(col("user_id"), lit(10)).as("cohort"),
        col("value"))
      .rollup("event_type", "cohort")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))

  /** Pivot event_type into per-user metric columns (explicit value list —
    * the two-pass infer-values form is a full extra scan at scale). */
  val xPivot: Q = (s, dir) =>
    RefQueries.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))

  /** Scale-path fuzzy join (FastSS deletion-neighbourhood equi-join): every
    * customer name vs one-char-deleted corruptions of ALL customer names,
    * pairs within edit distance 1. The oracle is the PLAIN levenshtein
    * join — the deletion-variant candidate generation is result-invariant
    * (complete by the FastSS pigeonhole + exact verify), so what's under
    * test is precisely the rewrite the operator exists for. */
  val xFuzzyJoin: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val left = c.where(col("c_custkey") <= 1000)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val p = (col("c_custkey") % length(col("c_name"))) + 1
    val right = c.select(col("c_custkey").as("id"),
      concat(col("c_name").substr(lit(1), p - 1),
        col("c_name").substr(p + 1, length(col("c_name")))).as("name"))
    graft.operators.FuzzyJoin.deletionJoin(left, col("id"), col("name"),
      right, col("id"), col("name"), maxDist = 1)
  }

  /** The maxDist ≥ 3 fuzzy tier (positional q-gram signature equi-join +
    * exact levenshtein verify) at the reference's street-matching distance
    * 5 (ServiceAlertAugmenter.py:163): diverse pseudo street names matched
    * against 3-edit corruptions (two deletions + one substitution). The
    * oracle is the PLAIN levenshtein join — the q-gram candidate
    * generation is result-invariant (count-filter completeness + exact
    * verify), so what's under test is the whole rewrite.
    *
    * Names are 24-char md5-hex slices, not raw text slices, and q = 3:
    * the synthetic corpus draws from a ~20-word vocabulary, so raw
    * prefixes put a large fraction of the corpus inside distance 5 of
    * each other — the quadratic TRUE-result blowup of a low-entropy key,
    * exactly what qgramJoin's scaladoc tells users to avoid keying on.
    * And on a 16-symbol alphabet, bigram keys have only 256 values —
    * q must satisfy σ^q ≫ distinct (gram, band) mass or every key goes
    * hot; trigrams give 4096. The hex names keep the workload
    * entity-like: distinct keys, corrupted copies as the only near
    * matches, survival threshold q·(k+1) = 18 ≤ 24 so the gram tier
    * covers everything. */
  val xFuzzyQgram: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val name = substring(md5(col("text")), 1, 24)
    val base = d.select(col("doc_id").as("id"), name.as("name"))
      .where(col("name").isNotNull && length(col("name")) >= 8)
    val left = base.select(col("id").as("l_id0"), col("name").as("l_name"))
    val ln = length(col("name"))
    val p1 = (col("id") % ln + 1).cast("int")
    val n1 = concat(col("name").substr(lit(1), p1 - 1),
      col("name").substr(p1 + 1, ln))
    val ln1 = ln - 1
    val p2 = (col("id") * 7 % ln1 + 1).cast("int")
    val n2 = concat(n1.substr(lit(1), p2 - 1), n1.substr(p2 + 1, ln1))
    val ln2 = ln - 2
    val p3 = (col("id") * 11 % ln2 + 1).cast("int")
    val n3 = concat(n2.substr(lit(1), p3 - 1), lit("#"), n2.substr(p3 + 1, ln2))
    val right = base.select(col("id").as("r_id0"), n3.as("r_name"))
    graft.operators.FuzzyJoin.qgramJoin(left, col("l_id0"), col("l_name"),
      right, col("r_id0"), col("r_name"), maxDist = 5, q = 3)
  }

  /** Composed end-to-end training-data pipeline — the library's operators
    * chained the way a real corpus-prep job chains them: token-count
    * filter → language ID → exact-dedup keep-one. Predicates are
    * integer/string only (no float thresholds), so the composition is
    * byte-exact against the composed SQL oracle. */
  val xPipeline: Q = (s, dir) => {
    val d = docs(s, dir)
    val toks = TextOps.tokenCounts(d, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
    // one-element-explode barrier: PushDownPredicates substitutes aliases
    // into filter conditions with NO cost guard, so without it the
    // pred_lang = 'en' filter below lands in a scan-side Filter carrying
    // the FULL 8-profile scoring expression — 11 tokenizer chains per
    // scanned row (PlanSpec locks the fixed shape). The Generate blocks
    // substitution; scoring runs once per row, in its projection.
    val lang = TextOps.languageId(d, col("doc_id"), col("text"), langProfiles)
      .select(col("doc_id"), explode(array(col("pred_lang"))).as("pred_lang"))
    val keeps = DedupOps.exact(d, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    d.select("doc_id")
      .join(toks, "doc_id").join(lang, "doc_id")
      .join(keeps, Seq("doc_id"), "left_semi")
      .where(col("n_tokens") >= 5 && col("pred_lang") === "en")
  }

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

  // ---- as-of join ----

  /** As-of join: every purchase picks up the user's latest signup version at
    * or before the purchase instant (left semantics — purchases before any
    * signup null-extend). The build side is pre-aggregated unique per
    * (user_id, ts) as the [[graft.operators.AsOfJoin]] contract requires;
    * the oracle is DuckDB's native ASOF LEFT JOIN — a genuinely independent
    * implementation of the same semantics. */
  val xAsofJoin: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
    val build = e.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("v_value"))
      .withColumn("v_ts", col("ts"))
    val probe = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOfJoin.asOf(probe, build, "user_id", "ts",
      Seq("v_ts", "v_value"))
  }

  /** The custom-physical-operator as-of form (AsOfJoinPlan → Strategy →
    * sorted-merge exec): same inputs, same DuckDB ASOF oracle — a third
    * independent implementation agreeing on the semantics. */
  val xAsofExec: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
    val build = e.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("v_value"))
      .withColumn("v_ts", col("ts"))
    val probe = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOfJoin.asOfExec(probe, build, "user_id", "ts",
      Seq("v_ts", "v_value"))
  }

  /** The NAIVE as-of formulation every feature-store tutorial writes — left
    * join on `key AND b.ts <= p.ts` plus a per-probe-row row_number argmax —
    * the exact O(probe × versions) shape operators/AsOfJoin.scala documents
    * as the scale-killer. [[graft.plans.RewriteNaiveAsOf]] recognises it
    * (the dropDuplicates gives the probe a provable distinct key, its
    * soundness guard; a no-op here — event_id is unique) and swaps the
    * subtree for the sorted-merge [[graft.plans.AsOfJoinExec]]; PlanSpec
    * locks that the window and pair join are GONE from the physical plan.
    * Same DuckDB ASOF LEFT JOIN oracle as x_asof_join: the rewrite must be
    * invisible in the result. */
  val xAsofRewrite: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = RefQueries.events(s, dir)
    val build = e.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("v_value"))
      .select(col("user_id").as("b_user_id"), col("ts").as("b_ts"),
        col("ts").as("v_ts"), col("v_value"))
    val probe = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .dropDuplicates("event_id")
    probe.join(build,
        probe("user_id") === build("b_user_id") && col("b_ts") <= probe("ts"),
        "left")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("event_id")).orderBy(col("b_ts").desc)))
      .where(col("__rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("v_ts"),
        col("v_value"))
  }

  // ---- corpus curation ----

  /** Gopher-style quality-rule battery; thresholds sit inside the corpus's
    * observed ranges (n∈[10,99], meanLen∈[3.7,5.3], dupPct∈[0,72] at sf0.01)
    * so keep genuinely splits. */
  val xQualityGopher: Q = (s, dir) =>
    QualityRules.gopherRules(docs(s, dir), col("doc_id"), col("text"),
      minTokens = 15, maxTokens = 1000,
      minMeanLenTenths = 40, maxMeanLenTenths = 50, maxDupPct = 55)

  /** Most-frequent token per document (Gopher top-n-gram family, n=1). */
  val xTopToken: Q = (s, dir) =>
    QualityRules.topToken(docs(s, dir), col("doc_id"), col("text"))

  /** PII scrubbing over deterministically planted PII (the synthetic corpus
    * contains none): each doc gains one email, one E.164-ish phone and one
    * IPv4, derived from doc_id, so counts and redaction are non-vacuous and
    * byte-identical across engines. */
  val xPiiScrub: Q = (s, dir) => {
    val withPii = docs(s, dir).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +2721400"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" at 192.168."), (col("doc_id") % 256).cast("string"), lit(".17"))
        .as("pii_text"))
    TextOps.scrubPii(withPii, col("doc_id"), col("pii_text"))
  }

  /** Cross-document boilerplate: 3-shingles appearing in ≥3 docs (2275 such
    * shingles at sf0.01, max doc-freq 7 — a real split). The shingle table
    * feeds two branches, so the query owns its persist (run-scoped;
    * CacheManager dedups by plan across bench repetitions). */
  val xBoilerplate: Q = (s, dir) =>
    CorpusOps.boilerplateFromShingles(
      TextOps.explodeShingles(docs(s, dir), col("doc_id"), col("text"), k = 3)
        .persist(),
      minDocs = 3)

  /** Weighted sample without replacement: 50 documents drawn ∝ n_chars
    * (longer docs likelier), md5-deterministic, ranked by the A-ES key as
    * TakeOrderedAndProject — no global sort. */
  val xWeightedSample: Q = (s, dir) =>
    CorpusOps.weightedSample(t(s, dir, "documents"), col("doc_id"),
        col("n_chars"), k = 50)
      .select(col("doc_id"), col("source"))

  /** Per-source weighted sample: the 3 best docs per source drawn ∝
    * n_chars — the per-domain-quota draw, two-phase windowed. */
  val xWeightedStratum: Q = (s, dir) =>
    CorpusOps.weightedSamplePerStratum(t(s, dir, "documents"), col("doc_id"),
        col("source"), col("n_chars"), k = 3)
      .select(col("doc_id"), col("source"))

  /** Deterministic stratified sample over `source` with per-stratum rates. */
  val xStratSample: Q = (s, dir) =>
    CorpusOps.stratifiedSample(t(s, dir, "documents"), col("doc_id"),
        col("source"),
        Map("src0" -> 0.8, "src1" -> 0.2, "src2" -> 0.5), defaultRate = 0.3)
      .select(col("doc_id"), col("source"))

  /** Source-level quality gate (the Gopher/RefinedWeb domain-eviction
    * step): per-doc stop-ratio → per-source mean → whole sources with
    * ≥10 docs and mean < 0.028 are evicted, every retained doc carries its
    * source's stats. The per-doc score is the same 4-dp stop_ratio
    * x_quality computes, so the oracle shares the canonical tokeniser. */
  val xSourceGate: Q = (s, dir) => {
    val scored = docs(s, dir)
      .select(col("doc_id"), col("source"),
        TextOps.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("source"),
        stopRatioOf(col("__toks")).as("stop_ratio"))
    CorpusOps.sourceQualityGate(scored, col("source"), col("stop_ratio"),
        minDocs = 10, minMean = 0.028)
      .select(col("doc_id"), col("source"), col("src_n"), col("src_mean"))
  }

  /** 4-dp English stop-ratio over a token array — ONE definition shared by
    * x_source_gate and x_curation_pipeline (the oracles mirror it via the
    * shared $TOK/$EN_STOPS macros, so a drift here is a hash mismatch). */
  private def stopRatioOf(toks: Column): Column = {
    val stops = TextOps.defaultProfiles.head._2
    round(size(filter(toks, t => t.isin(stops.map(lit): _*))) /
      greatest(size(toks), lit(1)).cast("double"), 4)
  }

  /** The deterministic page wrap shared by x_html_extract and
    * x_curation_pipeline — heading, script+style blocks, entity soup; both
    * oracles embed the identical literal. */
  private def pageOf(source: Column, text: Column): Column = concat(
    lit("<html><head><style>body{color:red}</style></head><body><h1>"),
    source,
    lit("</h1><script type=\"text/javascript\">var x = 1 &amp;&amp; 2;" +
      "</script><p>"),
    text,
    lit("</p><div class=\"footer\">&copy; &amp; &lt;fin&gt;&nbsp;ok" +
      "</div></body></html>"))

  /** Per-source length distribution (exact interpolated percentiles — the
    * oracle-checkable form; the approx_percentile scale path is locked by
    * CurationSpec's tolerance assertion instead). */
  val xGroupStats: Q = (s, dir) =>
    CorpusOps.groupStats(docs(s, dir), col("source"), col("n_chars"),
      Seq(0.5, 0.9), exact = true)

  /** Decontamination: docs sharing ≥2 3-shingles with the "eval suite"
    * (docs with doc_id % 100 == 7 stand in for it; the corpus's planted
    * near-duplicates guarantee non-vacuous overlap). */
  val xContamination: Q = (s, dir) => {
    val d = docs(s, dir)
    val isEval = col("doc_id") % 100 === 7
    CorpusOps.contamination(
      TextOps.explodeShingles(d.where(!isEval), col("doc_id"), col("text"), k = 3),
      TextOps.explodeShingles(d.where(isEval), col("doc_id"), col("text"), k = 3),
      minShared = 2)
  }

  /** Next-fit sequence packing of token counts into 256-token bins across
    * 8 md5 buckets. */
  val xPackSequences: Q = (s, dir) => {
    val toks = TextOps.tokenCounts(docs(s, dir), col("doc_id"), col("text"))
    CorpusOps.packSequences(toks, col("doc_id"), col("n_tokens"),
      maxTokens = 256, numBuckets = 8)
  }

  /** Top-5 tf-idf terms per document. */
  val xTfidf: Q = (s, dir) =>
    CorpusOps.tfidfTopTerms(docs(s, dir), col("doc_id"), col("text"), k = 5)

  /** Per-language distinct-token cardinality, exact form (count(distinct)
    * — the oracle-checkable shape). The HLL (`approx_count_distinct`) form
    * is the 100-TB path; its engine-specific estimates are locked by
    * CurationSpec's exact-vs-approx tolerance case instead (the groupStats
    * convention). */
  val xDistinct: Q = (s, dir) => {
    val tok = TextOps.withTokens(docs(s, dir), Seq(col("lang")), col("text"))
      .select(col("lang"), explode(col("__tk")).as("tok"))
    SketchOps.distinctCount(tok, col("lang"), col("tok"), exact = true)
  }

  /** Count-min heavy hitters: the 20 most frequent corpus tokens (exact
    * count, strict (cnt desc, tok) total order) with their sketch estimates
    * — estimates are md5-deterministic, so the DuckDB oracle rebuilds the
    * identical depth×width counters and the whole sketch is hash-compared,
    * not just bounded. */
  val xCountMin: Q = (s, dir) => {
    // the token stream feeds both the exact-count branch and the sketch
    // branch, which diverge before any Exchange — persist it (run-scoped,
    // CacheManager dedups by plan) so documents scan + tokenize once
    val tok = TextOps.withTokens(docs(s, dir), Seq.empty, col("text"))
      .select(explode(col("__tk")).as("tok"))
      .persist()
    val exact = tok.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    val sketch = SketchOps.countMin(tok, "tok", depth = 4, width = 256)
    exact.join(SketchOps.estimate(exact.select("tok"), "tok", sketch, 4, 256), "tok")
      .select(col("tok"), col("exact_cnt"), col("cm_est"))
  }

  // ---- repetition / rebalancing / pruning (round 4) ----

  /** Cross-document chunk dedup (C4-style duplicated-span removal) over
    * 8-token chunks: first global occurrence survives, documents are
    * reassembled from surviving chunks. */
  val xChunkDedup: Q = (s, dir) =>
    RepetitionOps.chunkDedup(docs(s, dir), col("doc_id"), col("text"), c = 8)

  /** Substring-span dedup (ExactSubstr, Lee et al. 2021) over overlapping
    * 8-token shingles: non-first occurrences mark [pos, pos+8) duplicated,
    * intervals merge into maximal spans, documents reassemble from
    * uncovered tokens. */
  val xSubstrDedup: Q = (s, dir) =>
    RepetitionOps.substrDedup(docs(s, dir), col("doc_id"), col("text"), k = 8)

  /** The 22-token boilerplate passage planted onto every 17th document —
    * shared verbatim with the x_longmatch_dedup oracle. Appending it after
    * texts of VARYING length puts the repeat at a different token offset
    * in every planted doc, which is exactly the any-offset case the
    * long-match tier exists for. */
  private val longRepeatBoiler =
    "subscribe to our newsletter for daily updates and breaking news " +
      "delivered straight to your inbox every morning without fail " +
      "thanks for reading"

  /** Long-match span dedup (the suffix-array ExactSubstr setting of Lee
    * et al. 2021: duplicated runs ≥ minLen tokens) over planted long
    * repeats: [[longRepeatBoiler]] appended to every 17th doc. Identical
    * semantics to x_substr_dedup at width 20, but the shuffle key is
    * md5(shingle) — 16 bytes instead of a ~120-byte 20-token string; the
    * oracle hashes the same space-joined windows. The globally-first
    * planted doc keeps the passage; every later one loses exactly its
    * boilerplate span. */
  val xLongMatchDedup: Q = (s, dir) =>
    RepetitionOps.longMatchDedup(
      docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 17 === 3,
          concat(col("text"), lit(" " + longRepeatBoiler)))
          .otherwise(col("text")).as("text")),
      col("doc_id"), col("text"), minLen = 20)

  /** Skip-gram (center, context, dist) pairs within a 3-token forward
    * window — word2vec data prep, built in-row with zero joins. */
  val xSkipgram: Q = (s, dir) =>
    TextOps.skipgramPairs(docs(s, dir), col("doc_id"), col("text"),
      window = 3)

  /** GloVe-style distance-weighted co-occurrence counts (window 3,
    * canonical pair order) — one vocabulary²-bounded aggregate. */
  val xCooc: Q = (s, dir) =>
    TextOps.coOccurrence(docs(s, dir), col("text"), window = 3)

  /** md5-deterministic unigram^0.75 negative sampling, 2 per skip-gram
    * pair (window 2) — bucketized interval lookup, float-free output. */
  val xNegSample: Q = (s, dir) =>
    TextOps.negativeSamples(docs(s, dir), col("doc_id"), col("text"),
      window = 2, k = 2)

  /** KMV distinct-token sketch per language, built as TWO half-corpus
    * states MERGED (the split-merge invariance surface: the oracle
    * computes the k minima directly from the whole corpus, so agreement
    * proves the merge), with the exact distinct count alongside for
    * visible accuracy. */
  val xKmvDistinct: Q = (s, dir) => {
    val k = 256
    val tok = TextOps.withTokens(
        docs(s, dir).where(col("lang").isNotNull),
        Seq(col("doc_id"), col("lang")), col("text"))
      .select(col("doc_id"), col("lang"), explode(col("__tk")).as("tok"))
    val st = SketchOps.kmvMerge(
      SketchOps.kmvState(tok.where(col("doc_id") % 2 === 0), col("lang"),
          col("tok"), k)
        .unionByName(SketchOps.kmvState(tok.where(col("doc_id") % 2 === 1),
          col("lang"), col("tok"), k)), k)
    val exact = tok.groupBy(col("lang").as("stratum"))
      .agg(count_distinct(col("tok")).as("n_exact"))
    SketchOps.kmvEstimate(st, k).join(exact, "stratum")
  }

  /** Unicode NFC canonicalisation (native [[graft.functions.NfcNormalize]]
    * vs DuckDB's utf8proc nfc_normalize — two independent Unicode
    * implementations agreeing on the normalized md5). The corpus is ASCII,
    * so a decomposed "e<combining-acute>" suffix is injected on a doc_id
    * residue class to exercise real recomposition. */
  val xNfcNorm: Q = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("e\u0301")))
          .otherwise(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        graft.functions.TextFunctions.nfcNormalize(col("t")).as("__n"))
      .select(col("doc_id"), (col("__n") =!= col("t")).as("changed"),
        md5(col("__n")).as("norm_hash"))

  /** Gopher repetition metrics per document: top-2-gram character coverage
    * and duplicated-5-gram character fraction. */
  val xRepetition: Q = (s, dir) =>
    RepetitionOps.repetitionMetrics(docs(s, dir), col("doc_id"), col("text"),
      topN = 2, dupN = 5)

  /** Bloom-pruned semi-join: lineitems of high-value orders, aggregated per
    * return flag. Oracle is the plain semi-join (Bloom pruning is
    * result-invariant — no false negatives + exact post-join). */
  val xBloomPrune: Q = (s, dir) => {
    val orders = t(s, dir, "orders").where(col("o_totalprice") > 400000)
    val pruned = graft.operators.BloomPrune.prunedSemiJoin(
      t(s, dir, "lineitem"), "l_orderkey", orders, "o_orderkey",
      expectedItems = 100000)
    pruned.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 4).as("sum_qty"))
  }

  /** Domain-mix rebalancing: every source capped at 10 documents by md5
    * order. */
  val xRebalance: Q = (s, dir) =>
    CorpusOps.domainRebalance(docs(s, dir), col("doc_id"), col("source"), cap = 10)
      .select(col("doc_id"), col("source"))

  /** Token-count histogram in 10-token bins. */
  val xTokHist: Q = (s, dir) =>
    CorpusOps.tokenHistogram(docs(s, dir), col("text"), binWidth = 10)

  /** SemDeDup over the planted embedding corpus: 16 clusters, 2 Lloyd
    * rounds, tau=0.99 — the planted exact copies and near-clones are
    * exactly what it must collapse (survivor = smallest id per duplicate
    * family within a cluster). */
  val xSemDedup: Q = (s, dir) =>
    SimilarityOps.semDedup(plantedEmbeddings(s, dir), "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, tau = 0.99)

  /** The auto-sized form: targetClusterSize 34 over the sf0.01 planted
    * corpus (540 vectors) yields nlist = ceil(540/34) = 16 — byte-identical
    * to x_semdedup's explicit call, so the two share one oracle; at larger
    * SFs the cluster size stays pinned while nlist grows with the corpus
    * (the knob's whole point). */
  val xSemDedupAuto: Q = (s, dir) =>
    SimilarityOps.semDedupAuto(plantedEmbeddings(s, dir), "vec_id", "embedding",
      targetClusterSize = 34, kmeansIters = 2, tau = 0.99)

  // ---- LM-based quality scoring (round 4) ----

  /** CCNet-style unigram perplexity: add-0.1 LM trained on the English
    * slice, scored over the whole corpus. English documents should land low,
    * which is exactly the CCNet head/tail separation. */
  val xLmScore: Q = (s, dir) => {
    val d = docs(s, dir)
    LmOps.lmScore(d, col("doc_id"), col("text"),
      LmOps.unigramCounts(d.where(col("lang") === "en"), col("text")))
  }

  /** DSIR importance weights: hashed-bigram log-ratio of the English slice
    * (target) vs the whole corpus (raw) — the self-raw form, which hashes
    * the corpus once and derives the raw counts from the same feature
    * stream (bit-identical to the two-pass general form; LmSpec locks it). */
  val xDsir: Q = (s, dir) => {
    val d = docs(s, dir)
    LmOps.dsirWeightsSelfRaw(d, col("doc_id"), col("text"),
      target = d.where(col("lang") === "en"), targetText = col("text"))
  }

  /** Interpolated bigram perplexity: count-pruned (minCount=2) bigram
    * model + add-0.1 unigram backoff, both trained on the English slice,
    * scored over the whole corpus — the KenLM-shaped step up from
    * x_lm_score (same train/score split, one order higher, pruned). */
  val xBigramLm: Q = (s, dir) => {
    val d = docs(s, dir)
    val ref = d.where(col("lang") === "en")
    LmOps.bigramLmScore(d, col("doc_id"), col("text"),
      LmOps.bigramModel(ref, col("text"), minCount = 2),
      LmOps.unigramCounts(ref, col("text")))
  }

  /** fastText-shaped quality classifier inference: hashed-bigram features
    * mean-pooled against a deterministic (bucket, weight) fixture standing
    * in for a trained model's output layer — the operator under test is
    * the broadcast-weights scoring pass, not the weights themselves. */
  val xLinClassify: Q = (s, dir) => classifierScores(s, dir)

  /** Temperature-scaled mixture sampling: tau=0.5 upweights rare sources,
    * 300-document target. */
  val xTempSample: Q = (s, dir) =>
    CorpusOps.temperatureSample(docs(s, dir), col("doc_id"), col("source"),
        tau = 0.5, targetTotal = 300)
      .select(col("doc_id"), col("source"))

  /** (doc_id, ppl, lang): the CCNet perplexity scoring chain shared by both
    * bucketing forms — English-reference unigram LM over the whole corpus. */
  private def ccnetScored(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    LmOps.lmScore(d, col("doc_id"), col("text"),
        LmOps.unigramCounts(d.where(col("lang") === "en"), col("text")))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
  }

  private def ccnetAgg(bucketed: DataFrame): DataFrame =
    bucketed.groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("ppl")), 4).as("avg_ppl"),
        round(min(col("ppl")), 4).as("min_ppl"),
        round(max(col("ppl")), 4).as("max_ppl"))

  /** CCNet-style head/middle/tail bucketing, exact-count form: per-language
    * ntile(3) over the English-reference perplexity, aggregated per
    * (lang, bucket). Equal-count buckets are the reference semantics; the
    * per-language window is a scale-killer at web scale (the dominant
    * language lands in one window partition), so the production path is
    * [[ExtQueries.xCcnetApprox]] — this form stays as its semantic anchor
    * (CurationSpec locks the two within tolerance). */
  val xCcnetBuckets: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    ccnetAgg(ccnetScored(s, dir)
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("lang")).orderBy(col("ppl"), col("doc_id")))))
  }

  /** CCNet bucketing, scale-safe form: per-language quantile THRESHOLDS
    * (tiny aggregate, broadcast) + map-side bucket assignment — no
    * per-stratum window anywhere in the plan (PlanSpec locks this). Exact
    * thresholds here so the DuckDB oracle byte-matches; the
    * approx_percentile path is the same code modulo the aggregate and is
    * tolerance-locked in CurationSpec. */
  val xCcnetApprox: Q = (s, dir) =>
    ccnetAgg(CorpusOps.quantileBuckets(ccnetScored(s, dir), col("lang"),
      col("ppl"), numBuckets = 3, exact = true))

  /** Deterministic 80/10/10 split, aggregated to per-split counts. */
  val xSplit: Q = (s, dir) =>
    CorpusOps.assignSplit(docs(s, dir), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").agg(count(lit(1)).as("n_docs"))

  /** Leakage-safe split: [[CorpusOps.assignSplit]] keyed on the DUP-CLUSTER
    * id rather than the doc id, so every member of a near-dup cluster
    * lands in the same split — the composition that stops train/test
    * contamination via near-duplicates (a doc-keyed split scatters a
    * 3-doc cluster across splits with probability ~1 − Σf³). The cluster
    * ids come from min-label propagation over the LSH candidate graph;
    * the oracle recomputes them with a recursive-CTE transitive closure,
    * then applies the same md5 split — two independent algorithms end to
    * end. */
  val xClusterSplit: Q = (s, dir) =>
    CorpusOps.assignSplit(
      DedupOps.dupClusters(docs(s, dir).select(col("doc_id")),
        candidates(s, dir)),
      col("cluster_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

  /** Deterministic shuffled-shard assignment: 8 buckets, in-bucket rank. */
  val xShuffleExport: Q = (s, dir) =>
    CorpusOps.shuffleExport(docs(s, dir), col("doc_id"), numBuckets = 8)
      .select(col("doc_id"), col("bucket"), col("rank"))

  /** PSI drift between the even-id and odd-id halves of the corpus over the
    * source distribution — the snapshot-to-snapshot mix-shift monitor. */
  val xPsiDrift: Q = (s, dir) => {
    val d = docs(s, dir)
    CorpusOps.psiDrift(
      d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
      col("source"), col("source"))
  }

  /** Two-sample KS statistic over document length between the even-id and
    * odd-id halves — the continuous-distribution drift monitor (PSI's
    * shape-blind complement); window runs over DISTINCT lengths only. */
  val xKsDrift: Q = (s, dir) => {
    // NOT docs(): the text-null gate would drag the fat text column into
    // the scan of a query that only needs (doc_id, n_chars) — ReadSchema
    // pruning is the point at scale
    val d = t(s, dir, "documents").where(col("n_chars").isNotNull)
    CorpusOps.ksTest(
      d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
      col("n_chars"), col("n_chars"))
  }

  /** Jensen–Shannon divergence between the two halves' token unigram
    * distributions — vocabulary drift, finite without smoothing. */
  val xJsDivergence: Q = (s, dir) => {
    val d = docs(s, dir)
    CorpusOps.jsDivergence(
      d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
      col("text"), col("text"))
  }

  // ---- product quantization (round 4) ----

  private def pqParts(s: SparkSession, dir: String) = {
    val all = plantedEmbeddings(s, dir)
    val corpus = all.where(col("vec_id") =!= 0)
    val query = all.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("q"))
    (corpus, query)
  }

  /** PQ/ADC top-10 for vector 0 against the planted corpus: 4 subspaces ×
    * 16 codewords, one Lloyd round. The 20 planted near-clones of vector 0
    * are what ADC must surface. */
  val xPqTopk: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    val cb = PqOps.train(corpus, "vec_id", "embedding", m = 4, ksub = 16, iters = 1)
    PqOps.adcTopK(corpus, "vec_id", "embedding", query, k = 10, cb)
  }

  /** IVF-PQ composition: 16 cosine cells (1 Lloyd round) pruned to 4
    * probed cells, survivors ranked by PQ ADC on their stored codes. */
  val xIvfPq: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    SimilarityOps.ivfPqTopK(corpus, "vec_id", "embedding", query, k = 10,
      nlist = 16, nprobe = 4, kmeansIters = 1, m = 4, ksub = 16, pqIters = 1)
  }

  /** Residual IVF-PQ (true IVFADC): same geometry as x_ivfpq but codes
    * quantize v − centroid[cell] and each probed cell scores against its own
    * query-residual table — the variant where the composition's accuracy
    * comes from. */
  val xIvfPqRes: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    SimilarityOps.ivfPqResTopK(corpus, "vec_id", "embedding", query, k = 10,
      nlist = 16, nprobe = 4, kmeansIters = 1, m = 4, ksub = 16, pqIters = 1)
  }

  /** Batch residual IVF-PQ: top-5 for every vec_id%100==1 query in one
    * pass — shared assignment/residual/codebook, relational per-(query,
    * cell) distance tables, no driver-side collect in the scoring path. */
  val xIvfPqBatch: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("q"))
    SimilarityOps.ivfPqResTopKBatch(emb, "vec_id", "embedding", queries,
      k = 5, nlist = 16, nprobe = 4, kmeansIters = 1, m = 4, ksub = 16,
      pqIters = 1)
  }

  /** Stored-index residual IVF-PQ: build the index artefacts (bucketed
    * codes table + centroids + codebook) through [[graft.ext.IvfPqIndex]],
    * then answer the x_ivfpq_res query FROM THE STORE — no re-training, no
    * re-encoding; the serve scan statically prunes to the 4 probed buckets.
    * Same oracle as x_ivfpq_res: stored and in-memory answers must
    * hash-match. */
  val xIvfPqStored: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    val table = "graft_ivfpq_codes_s"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val st = IvfPqIndex.build(corpus, "vec_id", "embedding",
      nlist = 16, kmeansIters = 1, m = 4, ksub = 16, pqIters = 1,
      codesTable = table,
      basePath = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_idx_s")
    IvfPqIndex.topK(s, st, "vec_id", query, k = 10, nprobe = 4)
  }

  /** Stored-index batch serve: the x_ivfpq_batch workload answered from the
    * stored artefacts — one build, 21 queries off the bucketed codes table.
    * Same oracle as x_ivfpq_batch. */
  val xIvfPqStoredBatch: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("q"))
    val table = "graft_ivfpq_codes_b"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val st = IvfPqIndex.build(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 1, m = 4, ksub = 16, pqIters = 1,
      codesTable = table,
      basePath = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_idx_b")
    IvfPqIndex.topKBatch(s, st, "vec_id", queries, k = 5, nprobe = 4)
  }

  /** Stored-index APPEND path: build on the EVEN half of the corpus,
    * append the odd half against the FROZEN quantizers (assign +
    * residual-encode with the stored centroids/codebook, bucketed
    * insertInto — [[graft.ext.IvfPqIndex.append]]), then serve the
    * x_ivfpq_res query over the union. The oracle derives the
    * centroids/codebook from the even half ONLY and encodes everything
    * with them — exactly the frozen-quantizer contract — so the daily
    * append-without-rebuild path is hash-checked end-to-end, not just
    * spec-locked. Build+append memoize together per (app, sf-dir): a
    * second invocation (Bench's warm-up/measured pair) must serve, not
    * re-append duplicate codes. */
  val xIvfPqAppend: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    val st = appendedIndexes.getOrElseUpdate(
      s"${s.sparkContext.applicationId}|$dir", {
        val table = s"graft_ivfpq_append_${math.abs(dir.hashCode)}"
        s.sql(s"DROP TABLE IF EXISTS $table")
        val built = IvfPqIndex.build(corpus.where(col("vec_id") % 2 === 0),
          "vec_id", "embedding", nlist = 16, kmeansIters = 1, m = 4,
          ksub = 16, pqIters = 1, codesTable = table,
          basePath = s"${sys.props("java.io.tmpdir")}/$table")
        IvfPqIndex.append(s, built, corpus.where(col("vec_id") % 2 =!= 0),
          "vec_id", "embedding")
        built
      })
    IvfPqIndex.topK(s, st, "vec_id", query, k = 10, nprobe = 4)
  }

  private val appendedIndexes =
    scala.collection.concurrent.TrieMap[String, IvfPqIndex.Stored]()

  /** Memoized stored-index builds for the SERVE-ONLY queries: one build per
    * (application, sf-dir, workload), shared by every later invocation in
    * the session. This is the Bench "untimed setup hook": Bench runs each
    * query twice (warm-up + measured), so the warm-up invocation pays the
    * build and the MEASURED run times nothing but the serve — the
    * build-once/serve-many number the stored index exists for. Verify pays
    * the build once too; answers are position-independent of who built
    * (frozen artefacts), so the serve queries reuse the x_ivfpq_res /
    * x_ivfpq_batch oracles unchanged. */
  private val servedIndexes =
    scala.collection.concurrent.TrieMap[String, IvfPqIndex.Stored]()

  private def servedIndex(s: SparkSession, dir: String, corpus: DataFrame,
                          workload: String): IvfPqIndex.Stored = {
    val table = s"graft_ivfpq_serve_${workload}_${math.abs(dir.hashCode)}"
    servedIndexes.getOrElseUpdate(s"${s.sparkContext.applicationId}|$table", {
      s.sql(s"DROP TABLE IF EXISTS $table")
      IvfPqIndex.build(corpus, "vec_id", "embedding",
        nlist = 16, kmeansIters = 1, m = 4, ksub = 16, pqIters = 1,
        codesTable = table,
        basePath = s"${sys.props("java.io.tmpdir")}/$table")
    })
  }

  /** Serve-only single-query form: answers the x_ivfpq_res workload from
    * warm stored artefacts — the build happens once per session via
    * [[servedIndex]] and is NOT part of this query's steady-state cost.
    * Same oracle as x_ivfpq_res (hash-match contract). */
  val xIvfPqServe: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    val st = servedIndex(s, dir, corpus, "s")
    IvfPqIndex.topK(s, st, "vec_id", query, k = 10, nprobe = 4)
  }

  /** Build-only stored-index entry: train + bucketed write + artefact
    * write, every invocation, nothing served back. Exists because the
    * retired x_ivfpq_stored/x_ivfpq_stored_batch bench rows timed BUILD +
    * bucketed WRITE + read-back in one number, which made them the two
    * most disk-state-sensitive entries in the set (r18: committed 2.59 s
    * vs 5.5–6.7 s in two isolated sessions, cw healthy throughout — the
    * variance was page-cache/write-back state, not steal). Every written
    * file is fsync'd before the entry returns, so each rep pays the real
    * flush instead of a number that depends on how much dirty page cache
    * the previous rep left behind. Returns the code-row count (one row):
    * every corpus vector is encoded exactly once, so n_codes must equal
    * the planted-corpus cardinality — the oracle checks that without
    * replaying the quantizers. */
  val xIvfPqBuild: Q = (s, dir) => {
    import s.implicits._
    val (corpus, _) = pqParts(s, dir)
    val table = "graft_ivfpq_codes_build"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val base = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_idx_build"
    IvfPqIndex.build(corpus, "vec_id", "embedding",
      nlist = 16, kmeansIters = 1, m = 4, ksub = 16, pqIters = 1,
      codesTable = table, basePath = base)
    fsyncTree(java.nio.file.Paths.get(base))
    Seq(s.table(table).count()).toDF("n_codes")
  }

  private def fsyncTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardOpenOption}
    if (!Files.exists(root)) return
    val walk = Files.walk(root)
    try walk.filter(p => Files.isRegularFile(p)).forEach { p =>
      val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.WRITE)
      try ch.force(true) finally ch.close()
    } finally walk.close()
  }

  /** Cold serve: the x_ivfpq_serve workload with the Spark-side metadata
    * caches dropped first — cached relation, file listing, and the
    * in-memory catalog entry for the codes table plus the
    * centroids/codebook paths — so every rep pays listing + parquet
    * footer reads + relation resolution, the first-query cost on a
    * serving node that just mounted the store. Deliberately NOT an OS
    * page-cache drop: that would be machine-global and poison every
    * other entry in the bench sequence. Same oracle as x_ivfpq_res
    * (cold vs warm must be a latency difference, never an answer
    * difference). */
  val xIvfPqServeCold: Q = (s, dir) => {
    val (corpus, query) = pqParts(s, dir)
    val st = servedIndex(s, dir, corpus, "s")
    s.catalog.refreshTable(st.codesTable)
    s.catalog.refreshByPath(st.centroidsPath)
    s.catalog.refreshByPath(st.codebookPath)
    IvfPqIndex.topK(s, st, "vec_id", query, k = 10, nprobe = 4)
  }

  /** Serve-only batch form: the x_ivfpq_batch workload from warm stored
    * artefacts. Same oracle as x_ivfpq_batch. */
  val xIvfPqServeBatch: Q = (s, dir) => {
    val emb = plantedEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("q"))
    val st = servedIndex(s, dir, emb, "b")
    IvfPqIndex.topKBatch(s, st, "vec_id", queries, k = 5, nprobe = 4)
  }

  /** Residual-IVFADC recall vs the exact squared-L2 top-10 — the honesty
    * row for the residual composition. On THIS planted corpus it equals the
    * raw form's 0.5 for the same reason documented at [[xPqRecall]]: vector
    * 0's whole clone family shares one cell, so their residuals — like their
    * raw vectors — collapse to one code signature and the id tie-break picks
    * a different ten than exact ranking. Residual encoding wins when
    * candidates SPREAD within cells (PqSpec's planted-family case asserts
    * residual ≥ raw there, and ≥ 0.6 absolute). */
  val xIvfPqResRecall: Q = (s, dir) => {
    import SimilarityOps.dot
    val (corpus, query) = pqParts(s, dir)
    val pq = SimilarityOps.ivfPqResTopK(corpus, "vec_id", "embedding", query,
        k = 10, nlist = 16, nprobe = 4, kmeansIters = 1, m = 4, ksub = 16,
        pqIters = 1)
      .select("vec_id")
    val v = col("embedding").cast("array<double>")
    val exact = corpus.crossJoin(broadcast(query))
      .select(col("vec_id"),
        round(dot(v, v) + dot(col("q"), col("q")) - lit(2.0) * dot(v, col("q")), 6)
          .as("d2"))
      .orderBy(col("d2").asc, col("vec_id")).limit(10).select("vec_id")
    pq.join(exact, "vec_id").agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), col("n_overlap"),
        round(col("n_overlap") / lit(10.0), 4).as("recall"))
  }

  /** PQ code-signature dedup over the planted corpus: the exact copies and
    * near-clones collapse to one survivor per code signature — the coarse
    * map-side pass before any exact similarity work. */
  val xCodeDedup: Q = (s, dir) => {
    val (corpus, _) = pqParts(s, dir)
    val cb = PqOps.train(corpus, "vec_id", "embedding", m = 4, ksub = 16, iters = 1)
    PqOps.codeDedup(PqOps.encode(corpus, "vec_id", "embedding", cb), "vec_id")
  }

  /** Recall of the PQ top-10 against the exact squared-L2 top-10 — the
    * honesty row for the compressed representation. On the planted corpus
    * this is 0.5 BY CONSTRUCTION, and that is the interesting part: vector
    * 0's exact copy and all 20 near-clones quantize to the SAME codes, so
    * ADC ties them at one distance and the id tie-break picks a different
    * ten than the exact ranking does. PQ collapses a near-duplicate family
    * into one code signature — exactly the resolution/compression trade
    * the operator exists to make (and why SemDeDup-style pipelines dedup
    * on codes first). */
  val xPqRecall: Q = (s, dir) => {
    import SimilarityOps.dot
    val (corpus, query) = pqParts(s, dir)
    val cb = PqOps.train(corpus, "vec_id", "embedding", m = 4, ksub = 16, iters = 1)
    val pq = PqOps.adcTopK(corpus, "vec_id", "embedding", query, k = 10, cb)
      .select("vec_id")
    val v = col("embedding").cast("array<double>")
    val exact = corpus.crossJoin(broadcast(query))
      .select(col("vec_id"),
        round(dot(v, v) + dot(col("q"), col("q")) - lit(2.0) * dot(v, col("q")), 6)
          .as("d2"))
      .orderBy(col("d2").asc, col("vec_id")).limit(10).select("vec_id")
    pq.join(exact, "vec_id").agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), col("n_overlap"),
        round(col("n_overlap") / lit(10.0), 4).as("recall"))
  }

  // ---- in-engine classifier training (round 10) ----

  /** Labeled corpus for the trained classifiers: text + lang both present,
    * label = English. */
  private def labeled(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(col("lang").isNotNull)

  /** Binary multinomial Naive Bayes, trained AND scored in-engine over the
    * corpus (label: lang = en) — one counting shuffle is the whole training
    * job; scoring is the lmScore join shape. */
  val xNbClassify: Q = (s, dir) => {
    val d = labeled(s, dir)
    val label = col("lang") === "en"
    val priors = d.agg(
      sum(when(label, 1L).otherwise(0L)).as("np"),
      sum(when(!label, 1L).otherwise(0L)).as("nn")).head()
    MlOps.naiveBayesScore(d, col("doc_id"), col("text"),
      MlOps.naiveBayesModel(d, col("text"), label),
      priors.getLong(0), priors.getLong(1))
  }

  /** (doc_id, x0=bias, x1=tokens/100, x2=stop ratio, y) — the logistic
    * regression feature frame; x2 reuses the x_quality stop-ratio column
    * definition verbatim so the oracle shares its proven SQL form. */
  private def logregFeats(s: SparkSession, dir: String): DataFrame = {
    val stops = langProfiles.head._2
    labeled(s, dir)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("__tk"))
      .select(col("doc_id"),
        lit(1.0).as("x0"),
        (size(col("__tk")).cast("double") / lit(100.0)).as("x1"),
        round(size(filter(col("__tk"), t => t.isin(stops.map(lit): _*))).cast("double") /
          greatest(size(col("__tk")), lit(1)), 4).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
  }

  /** Jaro-Winkler entity resolution: sorted-neighborhood blocking over the
    * union of clean + deletion-corrupted entity names (md5-hex keys — the
    * x_fuzzy_qgram entity-like-workload rationale), candidates verified
    * map-side by the native [[graft.functions.JaroWinkler]] expression at
    * θ = 0.9. The corruption deletes a char at a key-dependent position
    * ≥ 2, so the first-char blocking stratum is preserved. The oracle
    * rebuilds the identical window + offset join and verifies with
    * DuckDB's own jaro_winkler_similarity — two INDEPENDENT comparator
    * implementations agreeing pair-by-pair on the rounded score.
    *
    * Scale shape: blocking is linear-in-n candidates under any skew
    * (Blocking scaladoc); the verify is a pure map over pairs; names
    * rejoin by unique id (two m:1 equi-joins). */
  val xJwResolve: Q = (s, dir) => {
    val base = t(s, dir, "customer")
      .select(col("c_custkey").as("id"), substring(md5(col("c_name")), 1, 16).as("name"))
    val p = pmod(col("id"), lit(14)) + lit(2)
    val dirty = base.select((col("id") + lit(10000000L)).as("id"),
      concat(col("name").substr(lit(1), p - 1),
        col("name").substr(p + 1, lit(16) - p)).as("name"))
    val u = base.union(dirty)
    val jw = round(graft.functions.TextFunctions.jaroWinkler(col("__na"), col("__nb")), 6)
    graft.operators.Blocking.sortedNeighborhood(
        u, col("id"), substring(col("name"), 1, 1), col("name"), window = 6)
      .join(u.select(col("id").as("id_a"), col("name").as("__na")), "id_a")
      .join(u.select(col("id").as("id_b"), col("name").as("__nb")), "id_b")
      .where(jw >= 0.9)
      .select(col("id_a"), col("id_b"), jw.as("jw"))
  }

  /** Snapshot diff with per-column change classification over two
    * deterministically-derived versions of the orders table: keys % 13 = 0
    * exist only in the new snapshot (added), % 7 = 0 only in the old
    * (removed), and of the survivors % 5 = 0 get a re-priced total and
    * % 11 = 0 a flipped status (changed, with the column names recorded).
    * One full-outer sort-merge join; classification is map-side. */
  val xSnapshotDiff: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val oldSnap = o.where(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val newSnap = o.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, round(col("o_totalprice") * 1.1, 2))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    // the comma-joined string is the hash-compare surface; the array twin
    // (changed_cols_arr) is the programmatic one and is spec-locked instead
    graft.operators.SnapshotDiff.diff(oldSnap, newSnap,
      keyCols = Seq("o_orderkey"),
      compareCols = Seq("o_orderstatus", "o_totalprice"))
      .drop("changed_cols_arr")
  }

  /** Per-source winsorization of the document length at [p05, p95] —
    * bounds rounded before the clamp so the decision is engine-portable. */
  val xWinsorize: Q = (s, dir) =>
    CorpusOps.winsorize(t(s, dir, "documents"), col("doc_id"), col("source"),
      col("n_chars"), pLo = 0.05, pHi = 0.95, exact = true)

  /** The stream-stream attribution join's BATCH form — the SAME
    * [[graft.streaming.StreamJoin.attributeClicks]] definition (withWatermark
    * is a no-op on static inputs) over the events table: every (view, click)
    * pair of one user where the click lands within 10 minutes of the view.
    * Plans as ONE equi join on user_id with the time range as a residual —
    * the exact condition whose streaming execution
    * (StreamingSymmetricHashJoinExec) StreamJoinSpec locks batch-parity
    * against, so the oracle here transitively checks the streaming
    * semantics too. */
  val xClickAttrib: Q = (s, dir) => {
    val e = RefQueries.events(s, dir)
    val views = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    graft.streaming.StreamJoin.attributeClicks(views, clicks,
        "view_user", "click_user", "view_ts", "click_ts",
        watermark = "1 hour", maxDelaySeconds = 600)
      .select(col("view_id"), col("click_id"), col("view_user").as("user_id"))
  }

  /** Batch-GD logistic regression (3 iterations, lr 0.5) trained in-engine
    * on (token count, stop ratio) → P(English), then scored map-side with
    * the literal-bound weights. The oracle unrolls the identical rounded
    * trajectory, so the whole optimisation loop — not just the final
    * scores — is cross-engine-verified. */
  val xLogreg: Q = (s, dir) => {
    val f = logregFeats(s, dir)
    val w = MlOps.logisticTrain(f, Seq("x0", "x1", "x2"), "y",
      iters = 3, lr = 0.5).last
    MlOps.logisticScore(f, col("doc_id"), Seq("x0", "x1", "x2"), w)
  }
}
