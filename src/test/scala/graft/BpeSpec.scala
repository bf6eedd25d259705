package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.functions.TextFunctions

/** Subword (BPE/WordPiece-style) greedy longest-match segmentation: the
  * native expression against hand-derived segmentations, the concat
  * invariant over the real corpus, the single-char fallback contract, the
  * SQL surface, subword-count consistency, and the map-only plan shape. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def enc(words: String*): Map[String, Seq[String]] =
    words.toSeq.toDF("w")
      .select(col("w"), TextFunctions.bpeEncode(col("w"),
        TextOps.defaultBpeVocab).as("p"))
      .as[(String, Seq[String])].collect().toMap

  test("bpe_encode: hand-derived greedy longest-match segmentations") {
    val got = enc("theorem", "lighting", "weather", "x9z", "a", "")
    // greedy = LONGEST match at each position, not leftmost-pair merging:
    // 'theorem' takes 'the' (3) over 'th' (2)
    assert(got("theorem") === Seq("the", "or", "e", "m"))
    assert(got("lighting") === Seq("li", "g", "h", "ti", "ng"))
    assert(got("weather") === Seq("w", "ea", "ther"))
    assert(got("x9z") === Seq("x", "9", "z"))
    assert(got("a") === Seq("a"))
    assert(got("") === Seq.empty)
  }

  test("bpe_encode: single-character fallback keeps segmentation total " +
    "for characters outside the vocabulary") {
    val got = Seq("naïve").toDF("w")
      .select(TextFunctions.bpeEncode(col("w"), Seq("na", "ve")).as("p"))
      .as[Seq[String]].head()
    // 'ï' is in no piece: emitted as itself — concat still reproduces input
    assert(got === Seq("na", "ï", "ve"))
  }

  test("bpe_encode: concat-of-pieces reproduces every corpus token " +
    "(totality invariant over the real table)") {
    val bad = TextOps.withTokens(
        spark.read.parquet(sf() + "/documents.parquet")
          .where(col("text").isNotNull), Seq(col("doc_id")), col("text"))
      .select(explode(col("__tk")).as("tok"))
      .select(col("tok"),
        concat_ws("", TextFunctions.bpeEncode(col("tok"),
          TextOps.defaultBpeVocab)).as("rejoined"))
      .where(col("tok") =!= col("rejoined"))
    assert(bad.count() === 0)
  }

  test("bpe_encode SQL surface matches the DataFrame form") {
    val got = spark.sql(
      "SELECT bpe_encode('theorem', array('t','h','e','o','r','m','the','or'))")
      .as[Seq[String]].head()
    assert(got === Seq("the", "or", "e", "m"))
    // non-foldable vocabulary must fail at analysis, not mid-job
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_encode('x', array(cast(rand() AS STRING)))")
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("bpe_apply_merges SQL surface matches the DataFrame form") {
    // rank order on 'ting': (i,n)@1 then (in,g)@2 -> [t, ing]
    val got = spark.sql(
      "SELECT bpe_apply_merges('ting', array(array('i','n'), array('in','g')))")
      .as[Seq[String]].head()
    assert(got === Seq("t", "ing"))
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_apply_merges('x', array(array(cast(rand() AS STRING), 'b')))")
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT bpe_apply_merges('x', array(array('a','b','c')))")
    }
    assert(e2.getMessage.contains("2-element"), e2.getMessage)
    // foldable NULLs fail with the function's message, not an NPE or a
    // silent String.valueOf(null) -> "null" merge side
    val e3 = intercept[Exception] {
      spark.sql("SELECT bpe_apply_merges('x', " +
        "cast(NULL AS array<array<string>>))")
    }
    assert(e3.getMessage.contains("must not be NULL"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("SELECT bpe_apply_merges('x', array(array('a', NULL)))")
    }
    assert(e4.getMessage.contains("must not be NULL"), e4.getMessage)
    val e5 = intercept[Exception] {
      spark.sql("SELECT bpe_encode('x', cast(NULL AS array<string>))")
    }
    assert(e5.getMessage.contains("must not be NULL"), e5.getMessage)
    val e6 = intercept[Exception] {
      spark.sql("SELECT bpe_encode('x', array('a', NULL))")
    }
    assert(e6.getMessage.contains("NULL piece"), e6.getMessage)
  }

  test("subwordCounts agrees with bpeEncodeTokens piece counts and is " +
    "never below the token count") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val counts = TextOps.subwordCounts(df, col("doc_id"), col("text"))
    val fromRows = TextOps.bpeEncodeTokens(df, col("doc_id"), col("text"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_pieces"))
    val joined = counts.join(fromRows, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_subwords"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .as[(Long, Int, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, nTok, nSub, nPieces) =>
      assert(nSub === nPieces, s"doc $id")
      assert(nSub >= nTok, s"doc $id: a token yields >= 1 piece")
    }
  }

  // ---- merge-table learning (spec-locked: no portable SQL form. The
  // skip-merge ITSELF is replace-expressible — but only with BOTH-side
  // per-symbol delimiters ('|a||a|' over '|a||a||a||a|'; the single-
  // delimiter form replace(' a a ') SHARES boundary spaces, consumes the
  // next pair's separator, and yields [aa, a, aa] on five a's instead of
  // [aa, aa, a] — that is the x_bpe_merge_encode oracle's trick). What
  // has no oracle form is the per-round ARGMAX: each round's replace
  // pattern depends on a data-dependent aggregation over the previous
  // round's rewrite, and unrolling that per-word recursion in SQL is a
  // second engine, not an oracle.) ----

  /** Independent in-JVM reference: classic word-frequency BPE. */
  private def refLearn(wordCounts: Map[String, Long],
                       nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    def mergeRef(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var words = wordCounts.map { case (w, n) => w.map(_.toString).toVector -> n }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((rank, a, b, a + b, cnt))
        words = words.map { case (syms, n) => mergeRef(syms, a, b) -> n }
        rank += 1
      }
    }
    out.toSeq
  }

  test("bpeLearnMerges: hand-computed merges, skip semantics, early " +
    "exhaustion, tie to the smallest pair") {
    val df = Seq("aaa aaa ab").toDF("text")
    val got = TextOps.bpeLearnMerges(df, col("text"), nMerges = 10)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    // r1: (a,a) appears 2x in each 'aaa' (4 total) vs (a,b) 1 — merge 'aa';
    // skip semantics make 'aaa' -> [aa, a], so r2 counts (aa,a)=2; r3 is
    // the last possible pair, then the corpus is exhausted at rank 4
    assert(got === Seq((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L),
      (3, "a", "b", "ab", 1L)))
    val tie = TextOps.bpeLearnMerges(Seq("xy yx").toDF("text"),
      col("text"), nMerges = 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(tie === Seq((1, "x", "y", "xy", 1L))) // (x,y) < (y,x)
  }

  test("bpeLearnMerges equals the independent in-JVM reference on the " +
    "real corpus") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val wordCounts = TextOps.withTokens(df, Seq.empty, col("text"))
      .select(explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val expected = refLearn(wordCounts, nMerges = 6)
    val got = TextOps.bpeLearnMerges(df, col("text"), nMerges = 6)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("VOCABULARY DEPTH: bpeLearnMerges equals the in-JVM reference for " +
    "300 consecutive merges over the identifier corpus (customer names — " +
    "the highest-cardinality string corpus in the testdata), and the " +
    "closed-vocabulary documents corpus EXHAUSTS early with the full " +
    "collapse, stopping before the requested depth", LongRun) {
    // depth: the argmax-then-rewrite chain must hold rank by rank — one
    // wrong tie-break or skip anywhere reorders everything after it
    val cust = spark.read.parquet(sf("sf0.01") + "/customer.parquet")
    val custCounts = TextOps.withTokens(cust, Seq.empty, col("c_name"))
      .select(explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val expected = refLearn(custCounts, nMerges = 300)
    assert(expected.size === 300, "the identifier corpus must carry the depth")
    val got = TextOps.bpeLearnMerges(cust, col("c_name"), nMerges = 300)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === expected)

    // exhaustion: ~31 distinct tokens collapse completely well before the
    // requested depth; the loop must stop at the same rank as the
    // reference with the same final merges (BpeScaleProbe documents the
    // same boundary at bench scale)
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val docCounts = TextOps.withTokens(docs, Seq.empty, col("text"))
      .select(explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val expectedEx = refLearn(docCounts, nMerges = 500)
    assert(expectedEx.size < 500, "the closed vocabulary must exhaust")
    val gotEx = TextOps.bpeLearnMerges(docs, col("text"), nMerges = 500)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(gotEx === expectedEx)
  }

  test("learned merge table composes with bpe_encode: flattened pieces " +
    "keep segmentation total and use the merges") {
    val df = Seq("banana bandana").toDF("text")
    val merged = TextOps.bpeLearnMerges(df, col("text"), nMerges = 3)
      .select("merged").as[String].collect().toSeq
    val vocab = ('a' to 'z').map(_.toString) ++ merged
    val enc = Seq("banana").toDF("w")
      .select(TextFunctions.bpeEncode(col("w"), vocab).as("p"))
      .as[Seq[String]].head()
    assert(enc.mkString("") === "banana")
    assert(enc.exists(_.length > 1), s"no merge used: $enc")
  }

  /** In-JVM rank-order inference reference: chars, then one left-to-right
    * skip pass per merge in rank order (refLearn's mergeRef semantics). */
  private def refApply(w: String, merges: Seq[(String, String)]): Seq[String] = {
    def one(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    merges.foldLeft(w.map(_.toString).toVector) {
      case (s, (a, b)) => one(s, a, b)
    }
  }

  private def applied(merges: Seq[(String, String)],
                      words: String*): Map[String, Seq[String]] =
    TextOps.bpeApplyMerges(
        words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), merges)
      .groupBy("doc_id", "tp").agg(sort_array(collect_list(
        struct(col("pp"), col("piece")))).as("ps"))
      .join(words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "w"), "doc_id")
      .select(col("w"), col("ps.piece").as("pieces"))
      .as[(String, Seq[String])].collect().toMap

  test("bpeApplyMerges: rank-order inference diverges from greedy " +
    "longest-match exactly where BPE semantics demand") {
    // the canonical counterexample: merges (b,c)@1, (a,b)@2 on 'abc' —
    // rank order applies (b,c) FIRST (it outranks), so 'a' is stranded;
    // greedy longest-match over the flattened pieces takes 'ab' first
    val m = Seq("b" -> "c", "a" -> "b")
    assert(applied(m, "abc")("abc") === Seq("a", "bc"))
    val greedy = Seq("abc").toDF("w")
      .select(TextFunctions.bpeEncode(col("w"),
        Seq("a", "b", "c", "bc", "ab")).as("p"))
      .as[Seq[String]].head()
    assert(greedy === Seq("ab", "c"))
    // fixture-table divergence on a real English suffix: (i,n)@3 then
    // (in,g)@8 give [t, ing]; greedy takes the longest prefix 'ti' and
    // strands [ti, n, g]
    assert(applied(TextOps.defaultBpeMerges, "ting")("ting")
      === Seq("t", "ing"))
    val flat = (('a' to 'z') ++ ('0' to '9')).map(_.toString) ++
      TextOps.defaultBpeMerges.map { case (a, b) => a + b }
    val g2 = Seq("ting").toDF("w")
      .select(TextFunctions.bpeEncode(col("w"), flat).as("p"))
      .as[Seq[String]].head()
    assert(g2 === Seq("ti", "n", "g"))
    // left-to-right skip inside one rank: 'aaa' + (a,a) -> [aa, a]
    assert(applied(Seq("a" -> "a"), "aaa")("aaa") === Seq("aa", "a"))
    // multi-level composition: th -> the
    assert(applied(TextOps.defaultBpeMerges, "the")("the") === Seq("the"))
  }

  test("native BpeApplyMerges equals the delimited-string fold (the " +
    "oracle's exact form) on every corpus word type and on adversarial " +
    "tables") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val words = TextOps.withTokens(df, Seq.empty, col("text"))
      .select(explode(col("__tk")).as("w")).distinct()
    def cmp(merges: Seq[(String, String)]): Unit = {
      val diff = words.select(col("w"),
          TextFunctions.bpeApplyMerges(col("w"), merges).as("a"),
          TextOps.bpeMergeFold(col("w"), merges).as("b"))
        .where(not(col("a") === col("b")))
      assert(diff.isEmpty,
        diff.take(5).mkString(", ") + s" under $merges")
    }
    cmp(TextOps.defaultBpeMerges)
    cmp(Seq("a" -> "a"))            // self-pair: the skip semantics path
    cmp(Seq("t" -> "h", "th" -> "th")) // product-of-product rule sides
    cmp(Seq("zz" -> "qq"))          // sides no corpus word can produce
  }

  test("BpeEncode segments by CODE POINT: non-Latin single-char fallback, " +
    "CJK vocab pieces match, astral chars never split into surrogates") {
    def enc(w: String, vocab: Seq[String]): Seq[String] =
      Seq(w).toDF("w").select(TextFunctions.bpeEncode(col("w"), vocab).as("p"))
        .as[Seq[String]].head()
    // no piece matches the CJK prefix: each code point is ONE fallback piece
    assert(enc("你好ab", Seq("a", "b", "ab")) === Seq("你", "好", "ab"))
    // a CJK piece in the vocabulary is matched greedily
    assert(enc("你好ab", Seq("你好", "a", "b")) === Seq("你好", "a", "b"))
    val clef = "𝄞" // U+1D11E, non-BMP
    assert(enc(s"a${clef}b", Seq("a", "b")) === Seq("a", clef, "b"))
    // an astral piece is 2 code points (not 4 UTF-16 units): greedy match
    // must consume exactly the pair
    assert(enc(clef * 3, Seq(clef + clef)) === Seq(clef + clef, clef))
  }

  test("byte fallback (SentencePiece <0xXX> convention): unknown code " +
    "points expand to their UTF-8 bytes, known pieces are untouched, " +
    "segmentation is total and reversible") {
    def enc(w: String, vocab: Seq[String]): Seq[String] =
      Seq(w).toDF("w").select(TextFunctions.bpeEncode(col("w"), vocab,
        byteFallback = true).as("p")).as[Seq[String]].head()
    // Cyrillic д = 0xD0 0xB4; no Cyrillic piece in the vocab
    assert(enc("дab", Seq("a", "b", "ab")) ===
      Seq("<0xD0>", "<0xB4>", "ab"))
    // a vocab hit suppresses the fallback even for non-Latin pieces
    assert(enc("дab", Seq("д", "ab")) === Seq("д", "ab"))
    // astral clef U+1D11E = F0 9D 84 9E: four byte pieces, no surrogates
    val clef = "𝄞"
    assert(enc(s"a${clef}b", Seq("a", "b")) ===
      Seq("a", "<0xF0>", "<0x9D>", "<0x84>", "<0x9E>", "b"))
    // an unknown ASCII char is its single byte
    assert(enc("a_b", Seq("a", "b")) === Seq("a", "<0x5F>", "b"))
    // reversibility: byte pieces decode back to the original string
    val pieces = enc("привет", Seq("a"))
    val bytes = pieces.map(p =>
      Integer.parseInt(p.substring(3, 5), 16).toByte).toArray
    assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      === "привет")
    // byteFallback = false keeps the raw-char form (the fixture contract)
    def encRaw(w: String, vocab: Seq[String]): Seq[String] =
      Seq(w).toDF("w").select(TextFunctions.bpeEncode(col("w"), vocab)
        .as("p")).as[Seq[String]].head()
    assert(encRaw("дab", Seq("a", "b", "ab")) === Seq("д", "ab"))
  }

  test("native BpeApplyMerges matches the fold on non-ASCII and " +
    "astral-plane input: symbols are code points, not UTF-16 units") {
    val clef = "𝄞" // U+1D11E musical G clef (non-BMP)
    val words = Seq("café", "éclair", s"a${clef}b",
      clef * 3, "你好world", "naïve").toDF("w")
    def cmp(merges: Seq[(String, String)]): Unit = {
      val diff = words.select(col("w"),
          TextFunctions.bpeApplyMerges(col("w"), merges).as("a"),
          TextOps.bpeMergeFold(col("w"), merges).as("b"))
        .where(not(col("a") === col("b")))
      assert(diff.isEmpty,
        diff.take(5).mkString(", ") + s" under $merges")
    }
    cmp(TextOps.defaultBpeMerges)
    cmp(Seq("a" -> clef))       // rule side carrying an astral char
    cmp(Seq(clef -> clef))      // astral self-pair: skip over surrogates
    cmp(Seq("é" -> "c"))   // accented BMP rule side
    // explicit shape: the astral char is ONE symbol (a surrogate split
    // would yield 4 pieces here and diverge from the oracle's '(.)')
    val lone = Seq(s"a${clef}b").toDF("w")
      .select(TextFunctions.bpeApplyMerges(col("w"), Seq("x" -> "y")).as("p"))
      .as[Seq[String]].head()
    assert(lone === Seq("a", clef, "b"))
    val merged = Seq(s"a${clef}b").toDF("w")
      .select(TextFunctions.bpeApplyMerges(col("w"), Seq("a" -> clef)).as("p"))
      .as[Seq[String]].head()
    assert(merged === Seq(s"a$clef", "b"))
  }

  test("bpeLearnMerges -> bpeApplyMerges round-trips under the table's " +
    "OWN semantics on the real corpus (vs the in-JVM rank-order replay)") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val learned = TextOps.bpeLearnMerges(df, col("text"), nMerges = 6)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    assert(learned.size === 6)
    val got = TextOps.bpeApplyMerges(df, col("doc_id"), col("text"), learned)
      .groupBy("doc_id", "tp")
      .agg(sort_array(collect_list(struct(col("pp"), col("piece")))).as("ps"))
      .select(concat_ws("", col("ps.piece")).as("w"),
        col("ps.piece").as("pieces"))
      .distinct()
      .as[(String, Seq[String])].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, pieces) =>
      assert(pieces === refApply(w, learned), s"word $w")
    }
  }

  test("x_bpe_learned_pipeline: per-(source, piece) totals reconcile with " +
    "the corpus segmentation under the learned table; sides derivable") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val learned = TextOps.bpeLearnMerges(df, col("text"), nMerges = 8)
      .orderBy("rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(learned.size === 8)
    // BPE invariant: every rule side is a single char or the product of
    // an EARLIER rank (what makes rank-order application well-defined)
    val products = scala.collection.mutable.Set.empty[String]
    learned.foreach { case (_, l, r, m, _) =>
      assert(l.length == 1 || products.contains(l), s"left $l underivable")
      assert(r.length == 1 || products.contains(r), s"right $r underivable")
      assert(m === l + r)
      products += m
    }
    val pipe = SparkEntry.queries("x_bpe_learned_pipeline")(spark, sf())
    val total = pipe.agg(sum("n")).as[Long].head()
    val direct = TextOps.bpeApplyMerges(df, col("doc_id"), col("text"),
      learned.map(t => (t._2, t._3))).count()
    assert(total === direct,
      "aggregate piece count != direct segmentation row count")
    // merged pieces actually appear in the segmentation (the learned
    // table is live, not a no-op)
    val pieces = pipe.select("piece").distinct().as[String].collect().toSet
    assert(learned.map(_._4).count(pieces.contains) >= 4,
      s"learned products barely used: ${learned.map(_._4)} vs corpus pieces")
  }

  test("x_bpe_fertility: per-source sums reconcile with subwordCounts, " +
    "fertility >= 1, one partial-aggregated shuffle, no join") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("text").isNotNull)
    val fert = SparkEntry.queries("x_bpe_fertility")(spark, sf())
    val rows = fert.as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nTok, nSub, f) =>
      assert(nDocs > 0 && nSub >= nTok, s"$src")
      assert(f >= 1.0, s"$src fertility $f — every token yields >= 1 piece")
    }
    val total = TextOps.subwordCounts(df, col("doc_id"), col("text"))
      .agg(sum("n_tokens"), sum("n_subwords")).as[(Long, Long)].head()
    assert((rows.map(_._3).sum, rows.map(_._4).sum) === total)
    val p = fert.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"fertility must not join back:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1, p)
  }

  test("x_bpe_encode and subwordCounts are map-only: no Exchange") {
    Seq(
      SparkEntry.queries("x_bpe_encode")(spark, sf()),
      SparkEntry.queries("x_bpe_merge_encode")(spark, sf()),
      TextOps.subwordCounts(
        spark.read.parquet(sf() + "/documents.parquet"),
        col("doc_id"), col("text"))
    ).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"grew a shuffle:\n$p")
    }
  }
}
