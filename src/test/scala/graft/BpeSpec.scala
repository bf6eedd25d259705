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

  test("x_bpe_encode and subwordCounts are map-only: no Exchange") {
    Seq(
      SparkEntry.queries("x_bpe_encode")(spark, sf()),
      TextOps.subwordCounts(
        spark.read.parquet(sf() + "/documents.parquet"),
        col("doc_id"), col("text"))
    ).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"grew a shuffle:\n$p")
    }
  }
}
