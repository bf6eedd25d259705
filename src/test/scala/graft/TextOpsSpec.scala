package graft

import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, TextOps}

/** Ext text/dedup operator semantics on crafted documents. */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("dedupAgainstRegistry: exact + near tiers, within-batch dups not " +
    "flagged, short docs exact-only") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val registry = Seq(
      (100L, base),
      (101L, "completely different registry content about other things"),
      (102L, "hi")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                                  // exact dup of 100
      (2L, base.replace("epsilon", "EDITED")),     // near dup of 100
      (3L, "novel content nothing shares any tokens with whatsoever"),
      (4L, "novel content nothing shares any tokens with whatsoever"), // within-batch dup of 3: NOT flagged
      (5L, "hi"),                                  // exact dup of short 102
      (6L, "yo")).toDF("doc_id", "text")           // short, unique
    val got = graft.ext.DedupOps.dedupAgainstRegistry(
        batch, registry, col("doc_id"), col("text"),
        numHashes = 12, numBands = 4, theta = 0.5)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((true, true, false)))   // exact AND near (J = 1)
    assert(got(2L) == ((false, true, false)))
    assert(got(3L) == ((false, false, true)))
    assert(got(4L) == ((false, false, true)))
    assert(got(5L) == ((true, false, false)))  // too short to shingle
    assert(got(6L) == ((false, false, true)))
    assert(got.size == 6)
  }

  test("chunkTokens: overlap, short tail never redundant, short/empty docs") {
    val df = Seq(
      (1L, "a b c d e f g"),  // 7 toks, size 3 stride 2 -> 0:abc 1:cde 2:efg
      (2L, "a b"),            // shorter than size -> one short chunk
      (3L, "a b c"),          // exactly size -> ONE chunk, no empty tail
      (4L, "a b c d"),        // 4 toks -> 0:abc 1:cd (tail adds d)
      (5L, "")).toDF("doc_id", "text")
    val got = graft.ext.TextOps.chunkTokens(df, col("doc_id"), col("text"),
        size = 3, stride = 2)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got === Set(
      (1L, 0, "a b c", 3L), (1L, 1, "c d e", 3L), (1L, 2, "e f g", 3L),
      (2L, 0, "a b", 2L),
      (3L, 0, "a b c", 3L),
      (4L, 0, "a b c", 3L), (4L, 1, "c d", 2L)))
  }

  test("chunkTokens: stride == size tiles without overlap; bad strides " +
    "rejected") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = graft.ext.TextOps.chunkTokens(df, col("doc_id"), col("text"),
        size = 2, stride = 2)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got === Set((1L, 0, "a b", 2L), (1L, 1, "c d", 2L),
      (1L, 2, "e", 1L)))
    intercept[IllegalArgumentException](
      graft.ext.TextOps.chunkTokens(df, col("doc_id"), col("text"), 2, 3))
    intercept[IllegalArgumentException](
      graft.ext.TextOps.chunkTokens(df, col("doc_id"), col("text"), 2, 0))
  }

  test("tokens: lowercases, strips punctuation, never yields empties") {
    val df = Seq("Hello, World!  x2", "...", "", "a").toDF("text")
    val got = df.select(TextOps.tokens($"text").as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("hello", "world", "x2"), Seq(), Seq(), Seq("a")))
  }

  test("shingles: k=3 over short and exact-length docs") {
    val df = Seq("a b c d", "a b c", "a b").toDF("text")
      .select(TextOps.tokens($"text").as("toks"))
    val got = df.select(TextOps.shingles($"toks", 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq("a b c"), Seq()))
  }

  test("fingerprint: invariant to token order and duplication") {
    val df = Seq(1L -> "alpha beta gamma", 2L -> "gamma alpha beta alpha")
      .toDF("id", "text")
    val fps = TextOps.fingerprint(df, $"id", $"text")
      .select("fingerprint").as[String].collect().toSeq
    assert(fps.distinct.size == 1)
  }

  test("extractHtmlText: script/style content dropped, tags stripped, " +
    "entities decoded with &amp; last, whitespace collapsed, unclosed " +
    "markup tolerated") {
    val cases = Seq(
      (1L, "<html><body><h1>Title</h1><p>Hello   <b>world</b></p>" +
        "<script>var x = '<p>not text</p>';</script></body></html>",
        "Title Hello world"),
      (2L, "<STYLE type=\"x\">h1{}</STYLE>before<br/>after", "before after"),
      // &amp;lt; must decode to the LITERAL "&lt;", never to "<"
      (3L, "a &amp;lt; b &lt;i&gt; c&nbsp;d &#39;q&#39; &quot;r&quot;",
        "a &lt; b <i> c d 'q' \"r\""),
      // an unclosed tag swallows up to the NEXT '>' ([^>]* permits '<'),
      // the tolerant-degradation contract: text survives, never an error
      (4L, "unclosed <div and <em>plain</em>", "unclosed plain"),
      (5L, "no markup at all", "no markup at all"))
    val got = TextOps.extractHtmlText(
        cases.map(c => (c._1, c._2)).toDF("id", "h"), col("id"), col("h"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) === want, s"case $id")
    }
  }

  test("exact dedup groups identical content") {
    val df = Seq(1L -> "same text", 2L -> "same text", 3L -> "other")
      .toDF("doc_id", "text")
    val got = DedupOps.exact(df, $"doc_id", $"text")
      .orderBy("keep_id").as[(String, Long, Long)].collect().toSeq
    assert(got.map(g => (g._2, g._3)) == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH: identical docs collide, disjoint docs do not") {
    val df = Seq(
      10L -> "the quick brown fox jumps over the lazy dog tonight",
      20L -> "the quick brown fox jumps over the lazy dog tonight",
      30L -> "completely different words appear in this unrelated sentence here")
      .toDF("doc_id", "text")
    val sh = TextOps.explodeShingles(df, $"doc_id", $"text", 3)
    val sig = DedupOps.minhashSignature(sh, 12)
    val pairs = DedupOps.lshCandidates(DedupOps.lshBands(sig, 12, 4))
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((10L, 20L)))
  }

  test("jaccard: identical docs score 1.0") {
    val df = Seq(
      10L -> "the quick brown fox jumps over the lazy dog tonight",
      20L -> "the quick brown fox jumps over the lazy dog tonight")
      .toDF("doc_id", "text")
    val sh = TextOps.explodeShingles(df, $"doc_id", $"text", 3)
    val sig = DedupOps.minhashSignature(sh, 12)
    val pairs = DedupOps.lshCandidates(DedupOps.lshBands(sig, 12, 4))
    val j = DedupOps.jaccard(pairs, sh).as[(Long, Long, Double)].collect().toSeq
    assert(j == Seq((10L, 20L, 1.0)))
  }

  test("winnowing: shared token runs >= w+k-1 share a fingerprint; short docs drop out") {
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight nine $run ten eleven"),
      (3L, "completely different words here entirely now today"),
      (4L, "too short"))
      .toDF("doc_id", "text")
    val fp = TextOps.winnow(docs, col("doc_id"), col("text"), k = 3, w = 4)
    val rows = fp.collect().map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(4L)) // fewer shingles than one window
    // the guarantee: docs 1 and 2 share an 8-token run (>= w+k-1 = 6), so
    // their SELECTED sets must intersect; doc 3 shares nothing with doc 1
    val sel = TextOps.winnowSelected(docs, col("doc_id"), col("text"), 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((sel(1L) & sel(2L)).nonEmpty)
    assert((sel(1L) & sel(3L)).isEmpty)
  }

  test("simhashPairs serves every maxHamming in [0,31] via next-divisor blocks") {
    val sig = Seq((1L, 0L), (2L, 3L), (3L, 0xF0F0F0FL)).toDF("doc_id", "simhash")
    // maxHamming=2 needs >=3 blocks -> rounds up to 4; previously threw
    val got = DedupOps.simhashPairs(sig, maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L))) // hamming(0,3)=2 kept; others exceed 2
  }

  test("dupClusters: multi-hop chains collapse to one keep-id, singletons keep their own") {
    // components: {1,2,3,4} via a CHAIN (multi-hop propagation, which a
    // clique wouldn't exercise), {7,8}, and singleton {9}
    val docs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("doc_a", "doc_b")
    val got = DedupOps.dupClusters(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("dupClusters: pairs through docs absent from the universe still connect, output stays scoped") {
    // node 3 is only in the pair graph: 2-3-4 is one component, labels must
    // flow THROUGH it, but it must not appear in the output
    val docs = Seq(1L, 2L, 4L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = DedupOps.dupClusters(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 2L))
  }

  test("dupClusters: maxIters bounds a pathological path graph", LongRun) {
    val n = 8 // diameter 7: converges within the default bound
    val docs = (1L to n.toLong).toDF("doc_id")
    val chain = (1L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val full = DedupOps.dupClusters(docs, chain)
      .as[(Long, Long)].collect().toMap
    assert(full.values.toSet == Set(1L)) // converged: all reach label 1
    // strict (default): refuses to return partially-propagated labels
    intercept[IllegalStateException] {
      DedupOps.dupClusters(docs, chain, maxIters = 2).collect()
    }
    // explicit opt-out: bounded approximation, far end not yet relabelled
    val truncated = DedupOps.dupClusters(docs, chain, maxIters = 2, strict = false)
      .as[(Long, Long)].collect().toMap
    assert(truncated(n.toLong) != 1L)
  }

  test("simhash: identical docs equal, near-identical docs within hamming 3",
      LongRun) {
    val df = Seq(
      1L -> "spark catalyst optimizer rewrites logical plans into physical plans",
      2L -> "spark catalyst optimizer rewrites logical plans into physical plans",
      3L -> "spark catalyst optimizer rewrites logical plans into physical stages")
      .toDF("doc_id", "text")
    val sig = DedupOps.simhash(df, $"doc_id", $"text")
    val m = sig.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    val pairs = DedupOps.simhashPairs(sig, 31)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0L)
  }

  test("simhashPairs finds pairs whose differing bits straddle both 16-bit halves") {
    // bits 3, 17, 29 differ: both halves dirty (the old 2-half split missed
    // this), but blocks of 8 bits leave block 1 (bits 8-15) clean
    val sig = Seq(1L -> 0L, 2L -> ((1L << 3) | (1L << 17) | (1L << 29)))
      .toDF("doc_id", "simhash")
    val pairs = DedupOps.simhashPairs(sig, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 3L)))
    // and a distance-4 pair with all four blocks dirty is correctly excluded
    val sig4 = Seq(1L -> 0L, 2L -> ((1L << 3) | (1L << 9) | (1L << 17) | (1L << 29)))
      .toDF("doc_id", "simhash")
    assert(DedupOps.simhashPairs(sig4, maxHamming = 3).count() == 0)
  }

  test("languageId: stopword-dominant doc classified, empty doc und") {
    val df = Seq(1L -> "the cat and the dog of the house",
      2L -> "zzz qqq").toDF("id", "text")
    val got = TextOps.languageId(df, $"id", $"text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "und")
  }

  test("luhnValid: textbook card numbers pass, off-by-one digits fail") {
    val df = Seq(
      "79927398713",       // the classic Luhn example — valid
      "79927398710",       // same with wrong check digit — invalid
      "4539578763621486",  // valid 16-digit
      "4539578763621487",  // invalid
      "0",                 // single zero — valid (sum 0)
      "59").toDF("s")      // 5*2=10 -> 1+0... 9+1=10 -> valid
    val got = df.select($"s", TextOps.luhnValid($"s").as("v"))
      .as[(String, Boolean)].collect().toMap
    assert(got("79927398713") && !got("79927398710"))
    assert(got("4539578763621486") && !got("4539578763621487"))
    assert(got("0") && got("59"))
  }

  test("charEntropy: hand-computed; constant string scores 0; empty absent") {
    val df = Seq((1L, "aaaa"), (2L, "ab"), (3L, ""), (4L, null))
      .toDF("id", "text")
    val got = TextOps.charEntropy(df, $"id", $"text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((4L, 0.0)))
    // two equiprobable chars: ln 2
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(2L)._2 - math.log(2.0)) < 1e-6)
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("charEntropy: uniform noise scores above repetitive text") {
    val df = Seq((1L, "abcdefghijklmnop"), (2L, "abababababababab"))
      .toDF("id", "text")
    val got = TextOps.charEntropy(df, $"id", $"text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(2L))
  }

  test("skipgramPairs: hand-enumerated forward window, dist correct") {
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val got = TextOps.skipgramPairs(df, $"id", $"text", window = 2)
      .as[(Long, String, String, Int)].collect().toSet
    assert(got === Set(
      (1L, "a", "b", 1), (1L, "a", "c", 2),
      (1L, "b", "c", 1), (1L, "b", "d", 2),
      (1L, "c", "d", 1)))
  }

  test("skipgramPairs: window clamps at the document tail; 1-token doc " +
    "emits nothing") {
    val df = Seq((1L, "x"), (2L, "p q")).toDF("id", "text")
    val got = TextOps.skipgramPairs(df, $"id", $"text", window = 5)
      .as[(Long, String, String, Int)].collect().toSet
    assert(got === Set((2L, "p", "q", 1)))
  }

  test("negativeSamples: exactly one negative per (pair, slot), matching " +
    "the in-JVM cumulative-inversion replay") {
    val df = Seq((1L, "a b c a b a")).toDF("id", "text")
    val got = TextOps.negativeSamples(df, $"id", $"text", window = 2, k = 2)
      .as[(Long, String, String, Int, Int, String)].collect()
    // skipgram pairs for 6 tokens, window 2: 5 + 4 = 9 pairs, x2 slots
    assert(got.length === 18, "one negative per (pair occurrence, slot)")
    // in-JVM replay: vocab a:3 b:2 c:1 sorted; w = round((c^3)^(1/4)·2^16)
    // — the integer-exact quantized weights (association-independent sums)
    val vocab = Seq("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val ws = vocab.map { case (t, c) =>
      t -> Math.round(math.sqrt(math.sqrt((c * c * c).toDouble)) * 65536.0) }
    val cum = ws.scanLeft(("", 0L)) { case ((_, acc), (t, w)) => (t, acc + w) }.tail
    val z = cum.last._2.toDouble
    def draw(center: String, context: String, dist: Int, slot: Int): String = {
      // slot s reads 32-bit window s%4 of the batch-(s/4) digest
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$center:$context:$dist:${slot / 4}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
        .substring(8 * (slot % 4), 8 * (slot % 4) + 8)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 * z
      cum.find(_._2.toDouble > u).get._1
    }
    got.foreach { case (_, ce, cx, d, s, neg) =>
      assert(neg === draw(ce, cx, d, s), s"($ce,$cx,$d,$s)")
    }
  }

  test("negativeSamples: frequent tokens dominate the draw on a skewed corpus") {
    val text = (Seq.fill(60)("hot") ++ (1 to 12).map(i => s"rare$i"))
      .mkString(" ")
    val got = TextOps.negativeSamples(Seq((1L, text)).toDF("id", "text"),
        $"id", $"text", window = 1, k = 3)
      .groupBy("negative").count()
      .as[(String, Long)].collect().toMap
    val hot = got.getOrElse("hot", 0L).toDouble
    assert(hot / got.values.sum > 0.5,
      s"hot should dominate the ^0.75 distribution: $got")
  }

  test("coOccurrence: canonical pair order, 1/dist weights sum across docs") {
    // "a b a": pairs (a,b,1), (b,a,1)->(a,b,1), (a,a,2); "b a": (a,b,1)
    val df = Seq((1L, "a b a"), (2L, "b a")).toDF("id", "text")
    val got = TextOps.coOccurrence(df, $"text", window = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("a", "b")) === ((3L, 3.0)))
    assert(got(("a", "a")) === ((1L, 0.5)))
    assert(got.size === 2)
  }

  test("tokensUnicode: non-Latin text survives, NFC unifies decomposed " +
    "spellings, case folds, and the ASCII path is unchanged") {
    def tok(t: String): Seq[String] =
      Seq(t).toDF("text").select(TextOps.tokensUnicode($"text").as("tk"))
        .as[Seq[String]].head()
    // Cyrillic: lowered, ё (U+0451) kept
    assert(tok("Привет, МИР! ёлка") === Seq("привет", "мир", "ёлка"))
    // CJK kept whole per space-separated run (no case)
    assert(tok("你好 世界 data") === Seq("你好", "世界", "data"))
    // NFC: precomposed é == decomposed e+U+0301 — ONE token type
    assert(tok("café café") === Seq("café", "café"))
    // decomposed Ö+sharp-s lowercases to the precomposed form
    assert(tok("GRÖßE") === Seq("größe"))
    // punctuation/digits behave like the ASCII tokenizer on ASCII input
    val ascii = "The quick-brown F0X; jumps!! 42 times."
    assert(tok(ascii) ===
      Seq(ascii).toDF("text").select(TextOps.tokens($"text").as("tk"))
        .as[Seq[String]].head())
    // the ASCII tokenizer DELETES all of this — the gap this path closes
    assert(Seq("Привет 你好").toDF("text")
      .select(TextOps.tokens($"text").as("tk"))
      .as[Seq[String]].head() === Seq.empty)
  }

  test("x_langid_uni: residue classes 0/1 flip pred_lang to ru/zh — " +
    "non-Latin text genuinely reaches the scorer") {
    val got = SparkEntry.queries("x_langid_uni")(spark, sf())
      .select($"doc_id" % 11, $"pred_lang").distinct()
      .as[(Long, String)].collect().groupBy(_._1)
    assert(got(0L).map(_._2).toSet === Set("ru"))
    assert(got(1L).map(_._2).toSet === Set("zh"))
    // other classes never score ru/zh (their text is ASCII)
    (2L to 10L).foreach { m =>
      assert(!got(m).map(_._2).toSet.exists(Set("ru", "zh")),
        s"class $m leaked a non-Latin prediction")
    }
  }

  test("x_dedup_exact_uni: precomposed and decomposed variants of every " +
    "selected doc land in ONE content group") {
    val base = spark.read.parquet(sf() + "/documents.parquet")
      .where($"text".isNotNull && $"doc_id" % 17 === 0)
      .select($"doc_id").as[Long].collect()
    assert(base.nonEmpty)
    val dedup = SparkEntry.queries("x_dedup_exact_uni")(spark, sf())
    // every variant pair {1e9+d, 2e9+d} shares a group whose keep_id is
    // the precomposed variant (min id) — i.e. the NFC forms hashed equal
    val keepers = dedup.where($"keep_id" >= 1000000000L && $"n_dups" >= 2)
      .select($"keep_id").as[Long].collect().toSet
    base.foreach { d =>
      assert(keepers.contains(1000000000L + d),
        s"variants of doc $d did not unify under NFC")
    }
  }
}
