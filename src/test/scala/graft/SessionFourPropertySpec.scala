package graft

import org.apache.spark.sql.functions._

import graft.ext.{CorpusOps, LmOps, TextOps}

/** Seeded property checks for the session-4 operators against independent
  * Scala reference computations (the EventPropertySpec conventions):
  * bigram LM vs a naive in-memory model, Luhn vs the textbook loop,
  * MAD outliers vs a direct sort-based median. */
class SessionFourPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def randTexts(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")))
  }

  test("bigramLmScore ≡ naive in-memory model on random corpora") {
    for (seed <- Seq(1L, 2L)) {
      val refDocs = randTexts(seed, 30)
      val docs = randTexts(seed + 100, 20)
      val minCount = 2; val lambda = 0.7; val alpha = 0.1
      // in-memory reference
      def toks(s: String) = s.split(" ").toSeq.filter(_.nonEmpty)
      def bigrams(s: String) = { val t = toks(s); t.zip(t.drop(1)) }
      val refBg = refDocs.flatMap(d => bigrams(d._2))
      val bgCnt = refBg.groupBy(identity).view.mapValues(_.size).toMap
      val ctxTot = refBg.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val model = bgCnt.filter(_._2 >= minCount)
        .map { case (bg, c) => bg -> c / ctxTot(bg._1) }
      val uni = refDocs.flatMap(d => toks(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val t = uni.values.sum.toDouble; val v = uni.size.toDouble
      def pU(w: String) = (uni.getOrElse(w, 0L) + alpha) / (t + alpha * (v + 1))
      val want = docs.flatMap { case (id, s) =>
        val bgs = bigrams(s)
        if (bgs.isEmpty) None
        else {
          val lps = bgs.map(bg => math.log(
            lambda * model.getOrElse(bg, 0.0) + (1 - lambda) * pU(bg._2)))
          Some(id -> (bgs.size.toLong, lps.sum / lps.size))
        }
      }.toMap
      // spark side
      val refDf = refDocs.toDF("doc_id", "text")
      val got = LmOps.bigramLmScore(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"),
          LmOps.bigramModel(refDf, col("text"), minCount),
          LmOps.unigramCounts(refDf, col("text")), lambda, alpha)
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got.keySet === want.keySet, s"seed $seed")
      for ((id, (n, avg)) <- want) {
        assert(got(id)._1 === n, s"seed $seed doc $id n_bigrams")
        assert(math.abs(got(id)._2 - avg) < 2e-6,
          s"seed $seed doc $id: ${got(id)._2} vs $avg")
      }
    }
  }

  test("luhnValid ≡ the textbook mod-10 loop on random digit strings") {
    val rnd = new scala.util.Random(5)
    val cands = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(10 + rnd.nextInt(9))(rnd.nextInt(10)).mkString))
    def refLuhn(s: String): Boolean = {
      val digits = s.reverse.map(_ - '0')
      digits.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    }
    val got = cands.toDF("id", "s")
      .select($"id", TextOps.luhnValid($"s").as("v"))
      .as[(Long, Boolean)].collect().toMap
    val agreeing = cands.count { case (id, s) => got(id) == refLuhn(s) }
    assert(agreeing === cands.size)
    // sanity: both branches exercised
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("madOutliers ≡ direct sort-based median/MAD on random strata") {
    val rnd = new scala.util.Random(13)
    val rows = for {
      s <- Seq("a", "b", "c"); i <- 1 to (5 + rnd.nextInt(40))
    } yield (s.hashCode.toLong * 1000 + i, s, rnd.nextInt(1000))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val m = med(rs.map(_._3.toDouble))
      val devs = rs.map(r => math.abs(r._3 - m))
      val mad = med(devs)
      rs.zip(devs).map { case (r, d) => r._1 -> (d > 3 * mad) }
    }
    val got = CorpusOps.madOutliers(rows.toDF("id", "src", "x"),
        col("id"), col("src"), col("x"))
      .select("doc_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got === want)
  }
}
