package graft

import org.apache.spark.sql.functions._

import graft.ext.CorpusOps

/** BM25 retrieval and PMI collocations against hand-computed values, plus
  * the scale-shape locks: the BM25 explode is term-filtered map-side and
  * the top-k is an ordered limit, never a global sort. */
class RetrievalSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus() = Seq(
    (1L, "cat dog cat"), (2L, "dog bird"), (3L, "fish"))
    .toDF("doc_id", "text")

  test("bm25TopK matches the hand-computed Okapi scores") {
    // N=3, avgdl=2; df(cat)=1, df(dog)=2; doc1 {cat:2,dog:1} dl=3,
    // doc2 {dog:1} dl=2, doc3 matches nothing
    val got = CorpusOps.bm25TopK(corpus(), col("doc_id"), col("text"),
        Seq("cat", "dog"), k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.5726), (2L, 0.47)))
  }

  test("bm25 k bounds the result and ranking is (score desc, doc_id)") {
    val got = CorpusOps.bm25TopK(corpus(), col("doc_id"), col("text"),
        Seq("dog"), k = 1)
      .as[(Long, Double)].collect().toSeq
    // same tf=1/df=2 for both docs; doc2's shorter length wins on dl norm
    assert(got.map(_._1) === Seq(2L))
  }

  test("bm25 plan: term filter below the explode, TakeOrdered top-k") {
    // over the parquet corpus (a literal one constant-folds the filter away)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .where(col("text").isNotNull)
    val p = CorpusOps.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("cat", "dog"), k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    // the explode consumes the pre-filtered __qt array, not the raw tokens
    assert(p.contains("filter(") && p.contains("Generate explode(__qt"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"), p)
  }

  test("pmiCollocations matches the hand-computed PMI and minCount prunes") {
    // bigrams: (a,b)×2, (b,a)×1, (a,c)×1 → nb=4; unigrams a:3 b:2 c:1 → nu=6
    // PMI(a,b) = ln((2/4) / ((3/6)·(2/6))) = ln 3
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = CorpusOps.pmiCollocations(df, col("text"), minCount = 2, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", "b", 2L, math.log(3.0))).map(t =>
      (t._1, t._2, t._3, math.rint(t._4 * 10000) / 10000)))
  }

  test("pmi: single-token and empty docs contribute no bigrams") {
    val df = Seq((1L, "x y x y"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = CorpusOps.pmiCollocations(df, col("text"), minCount = 1, k = 10)
      .as[(String, String, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet ===
      Set(("x", "y"), ("y", "x")))
  }

  private def phraseDocs() = Seq(
    (1L, "the quick brown fox jumps"),        // 1 occurrence mid-doc
    (2L, "quick brown fox quick brown fox"),  // 2 occurrences, at start+end
    (3L, "quick brown cat quick fox brown"),  // all terms, never the phrase
    (4L, "brown fox quick"),                  // wrong order
    (5L, "")).toDF("doc_id", "text")

  test("phraseSearch: order-sensitive, counts every occurrence, " +
    "term-presence alone never matches") {
    val got = CorpusOps.phraseSearch(phraseDocs(), col("doc_id"), col("text"),
        Seq("quick", "brown", "fox"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("phraseSearch: overlapping occurrences and duplicate phrase terms") {
    val df = Seq((1L, "a a a a"), (2L, "b a a b"), (3L, "a b a"))
      .toDF("doc_id", "text")
    // phrase "a a": doc1 has anchors 0,1,2; doc2 has 1; doc3 none
    val got = CorpusOps.phraseSearch(df, col("doc_id"), col("text"),
        Seq("a", "a")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L))
  }

  test("phraseSearch: single-term phrase degenerates to term counting") {
    val df = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    val got = CorpusOps.phraseSearch(df, col("doc_id"), col("text"), Seq("x"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L))
  }

  test("rrfFuse: hand-computed fusion, missing docs contribute nothing, " +
    "round-before-rank ties to smallest doc_id") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val r2 = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = CorpusOps.rrfFuse(Seq(r1, r2), topK = 10, k0 = 60)
      .as[(Long, Double, Long)].collect().toSeq
    def f(r: Int) = 1.0 / (60 + r)
    def rd(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20 appears in both lists and must win
    assert(got.head == ((20L, rd(f(2) + f(1)), 2L)))
    assert(got.map(_._1) == Seq(20L, 10L, 40L, 30L))
    assert(got.map(_._3) == Seq(2L, 1L, 1L, 1L))
  }

  test("rrfFuse: topK bounds the output; a single ranking passes through " +
    "in rank order") {
    val r = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val got = CorpusOps.rrfFuse(Seq(r), topK = 2)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
  }

  test("phraseSearch: phrase longer than the doc never matches") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(CorpusOps.phraseSearch(df, col("doc_id"), col("text"),
      Seq("a", "b", "c")).isEmpty)
  }
}
