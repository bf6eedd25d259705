package graft

import org.apache.spark.sql.functions._

import graft.ext.{CorpusOps, WebOps}

/** URL canonicalization hand cases + idempotence, and the integer-exact
  * weighted Bernoulli sampler (rate proportionality, determinism, guards). */
class WebOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u").select(WebOps.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq

  test("canonicalizeUrl: scheme/host case, default ports, fragments, " +
    "tracking params, query order") {
    val got = canon(
      "HTTP://Example.COM:80/A/B?b=2&a=1#frag",
      "https://example.com:443/x",
      "https://example.com:8443/x",            // non-default port kept
      "http://example.com/p?utm_source=a",     // tracking-only query drops
      "http://example.com/p?utm_source=a&q=1", // leading tracking promotes
      "http://example.com/p?q=1&fbclid=z",     // trailing tracking drops
      "  https://EX.com/CaseSensitivePath  ",  // trim; path case kept
      "not a url at all")
    assert(got === Seq(
      "http://example.com/A/B?a=1&b=2",
      "https://example.com/x",
      "https://example.com:8443/x",
      "http://example.com/p",
      "http://example.com/p?q=1",
      "http://example.com/p?q=1",
      "https://ex.com/CaseSensitivePath",
      "not a url at all"))
  }

  test("canonicalizeUrl is idempotent over the planted corpus") {
    val q = SparkEntry.queries("x_url_canon")(spark, sf())
    val twice = q.select(col("canon_url"),
        WebOps.canonicalizeUrl(col("canon_url")).as("again"))
      .where(col("canon_url") =!= col("again"))
    assert(twice.count() === 0)
  }

  test("weightedBernoulli: empirical keep rate tracks w/maxW per weight " +
    "class; zero weights never kept; deterministic") {
    val n = 4000
    // three weight classes: 1000, 500, 100 (max 1000)
    val df = (1 to n).map(i => (i.toLong, Seq(1000L, 500L, 100L)(i % 3)))
      .toDF("id", "w")
    val kept = CorpusOps.weightedBernoulli(df, col("id"), col("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    def rate(w: Long): Double = kept.getOrElse(w, 0L).toDouble / (n / 3)
    assert(math.abs(rate(1000L) - 1.0) < 1e-9, s"max weight keeps all: ${rate(1000L)}")
    assert(math.abs(rate(500L) - 0.5) < 0.06, s"rate(500)=${rate(500L)}")
    assert(math.abs(rate(100L) - 0.1) < 0.04, s"rate(100)=${rate(100L)}")
    val zeros = CorpusOps.weightedBernoulli(
      Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("id", "w"),
      col("id"), col("w")).select("id").as[Long].collect().toSeq
    assert(zeros === Seq(3L)) // w=10 is the max → kept with certainty
    val a = CorpusOps.weightedBernoulli(df, col("id"), col("w"))
      .select("id").as[Long].collect().toSet
    val b = CorpusOps.weightedBernoulli(df, col("id"), col("w"))
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("weightedBernoulli: the overflow guard trips past 2^31 weights") {
    val df = Seq((1L, 1L), (2L, (1L << 33))).toDF("id", "w")
    val ex = intercept[Exception] {
      CorpusOps.weightedBernoulli(df, col("id"), col("w")).collect()
    }
    assert(ex.getMessage.contains("2^31"), ex.getMessage)
  }
}
