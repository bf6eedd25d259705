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

  test("hostStatsKmv: exact below k (equals hostStats), estimator within " +
    "KMV tolerance on a hot host, sketch state stays k-bounded") {
    // cold hosts: 3 hosts x 30 distinct pages, each fetched twice -> the
    // sketch sees every hash (below k), so the row must EQUAL the exact
    // hostStats row, dup_rate included
    val cold = (0 until 3).flatMap { h =>
      (0 until 60).map { i =>
        s"https://cold$h.example.com/p/${i % 30}"
      }
    }
    // one hot host: 20_000 distinct pages through a k = 256 buffer —
    // the (k-1)*2^60/u_k estimator path; KMV relative error ~1/sqrt(k-2)
    val hot = (0 until 20000).map(i => s"https://hot.example.com/p/$i")
    val df = (cold ++ hot).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("fetch_id", "url")
    val got = WebOps.hostStatsKmv(df, col("url"), k = 256)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val exact = WebOps.hostStats(df, col("url"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    (0 until 3).foreach { h =>
      assert(got(s"cold$h.example.com") === exact(s"cold$h.example.com"))
      assert(got(s"cold$h.example.com")._3 === 30L)
    }
    val est = got("hot.example.com")._3.toDouble
    assert(math.abs(est - 20000.0) / 20000.0 < 4.0 / math.sqrt(254.0),
      s"hot-host estimate $est vs 20000 outside 4 sigma")
    // the aggregate buffer is the k minima, not the distinct set: the
    // sketch column the estimator reads is capped at k entries
    val state = df
      .groupBy(WebOps.hostOf(col("url")).as("host"))
      .agg(graft.functions.SketchFunctions.kmv_agg(
        graft.ext.SketchOps.hash60(col("url")), 256).as("kmv"))
      .select(max(size(col("kmv")))).as[Int].head()
    assert(state === 256)
  }

  test("weightedBernoulli: the overflow guard trips past 2^31 weights") {
    val df = Seq((1L, 1L), (2L, (1L << 33))).toDF("id", "w")
    val ex = intercept[Exception] {
      CorpusOps.weightedBernoulli(df, col("id"), col("w")).collect()
    }
    assert(ex.getMessage.contains("2^31"), ex.getMessage)
  }
}
