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

  test("staged canonicalized() equals the single-Column form on hand " +
    "cases and the planted corpus") {
    val hand = Seq(
      "HTTP://Example.COM:80/A/B?b=2&a=1#frag", "https://example.com:443/x",
      "https://example.com:8443/x", "http://example.com/p?utm_source=a",
      "http://example.com/p?utm_source=a&q=1", "http://example.com/p?q=1&fbclid=z",
      "  https://EX.com/CaseSensitivePath  ", "not a url at all")
      .toDF("u")
    val both = WebOps.canonicalized(hand, col("u"))
      .withColumn("viaCol", WebOps.canonicalizeUrl(col("u")))
      .where(col("canon_url") =!= col("viaCol"))
    assert(both.count() === 0)
    val corpus = SparkEntry.queries("x_url_canon")(spark, sf())
      .withColumn("viaCol", WebOps.canonicalizeUrl(col("url")))
      .where(col("canon_url") =!= col("viaCol"))
    assert(corpus.count() === 0)
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

  test("streaming frontier urlDedup: spelling variants of one page " +
    "collapse within the watermark, state evicts past it (re-emission)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamDedup
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamDedup.urlDedup(
        in.toDF().toDF("fetch_id", "url", "ts"), "url", "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("frontier_out").start()
    in.addData(
      (1L, "HTTP://Example.COM:80/a?b=2&a=1#x", ts("2024-01-01 00:00:00")),
      (2L, "https://other.com/", ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    // three spellings of fetch 1's page within the horizon -> suppressed
    in.addData(
      (3L, "http://example.com/a?a=1&b=2", ts("2024-01-01 00:20:00")),
      (4L, "http://EXAMPLE.com/a?b=2&a=1&utm_source=z", ts("2024-01-01 00:30:00")))
    q.processAllAvailable()
    // advance the watermark, then the same page again -> re-emitted
    in.addData((5L, "https://waterline.com/advance", ts("2024-01-01 05:00:00")))
    q.processAllAvailable()
    in.addData((6L, "http://example.com/a?a=1&b=2", ts("2024-01-01 04:30:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("frontier_out").select("fetch_id")
      .as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 5L, 6L))
  }

  test("hostStats: hand corpus with duplicate fetches — host extraction, " +
    "exact page distincts, dup_rate") {
    val fetches = Seq(
      "HTTP://A.com:80/x", "http://a.com/x",           // same page, host a.com
      "http://a.com/y",
      "https://B.org/z?q=1#f", "https://b.org/z?q=1")  // same page, host b.org
      .toDF("url")
    val got = WebOps.hostStats(
        WebOps.canonicalized(fetches, col("url")), col("canon_url"))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a.com", 3L, 2L, 0.3333), ("b.org", 2L, 1L, 0.5)))
  }

  test("x_web_pipeline composition invariants: one fetch per canonical " +
    "URL (the group min), cdc stats bounded, sample is a subset") {
    val out = SparkEntry.queries("x_web_pipeline")(spark, sf())
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // one row per canonical URL at most
    assert(out.map(_._2).distinct.length === out.length)
    out.foreach { case (id, canon, nc, nk, _) =>
      assert(!canon.contains("#") && !canon.contains("utm_") &&
        canon.startsWith("https://www.site.example.com/page/"), canon)
      // survivor is its page's minimum doc_id: the planted page key is
      // doc_id % 250, so no smaller doc with the same residue may have text
      assert(nk >= 0 && nk <= nc && nc >= 1, s"doc $id stats ($nc, $nk)")
    }
    val p = SparkEntry.queries("x_web_pipeline")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("weightedBernoulli: the overflow guard trips past 2^31 weights") {
    val df = Seq((1L, 1L), (2L, (1L << 33))).toDF("id", "w")
    val ex = intercept[Exception] {
      CorpusOps.weightedBernoulli(df, col("id"), col("w")).collect()
    }
    assert(ex.getMessage.contains("2^31"), ex.getMessage)
  }
}
