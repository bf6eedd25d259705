package graft

import org.apache.spark.sql.functions._

import graft.ext.LmOps

/** CCNet-style unigram LM perplexity and DSIR importance weights. */
class LmSpec extends SparkTestBase {

  import spark.implicits._

  // ---- lmScore ----

  test("lmScore: hand-computed add-alpha probabilities, OOV smoothed not dropped") {
    // reference: "a a b" -> cnt(a)=2, cnt(b)=1, T=3, V=2
    val ref = Seq((0L, "a a b")).toDF("doc_id", "text")
    val cnts = LmOps.unigramCounts(ref, col("text"))
    assert(cnts.as[(String, Long)].collect().toSet === Set(("a", 2L), ("b", 1L)))

    // alpha=0.1: denom = 3 + 0.1*3 = 3.3; p(a)=2.1/3.3, p(b)=1.1/3.3, p(oov)=0.1/3.3
    val docs = Seq((1L, "a b"), (2L, "zz")).toDF("doc_id", "text")
    val got = LmOps.lmScore(docs, col("doc_id"), col("text"), cnts, alpha = 0.1)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val lpA = math.log(2.1 / 3.3); val lpB = math.log(1.1 / 3.3)
    val avg1 = BigDecimal((lpA + lpB) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._2 === 2L)
    assert(math.abs(got(1L)._3 - avg1) < 1e-9)
    val lpOov = math.log(0.1 / 3.3)
    assert(math.abs(got(2L)._3 -
      BigDecimal(lpOov).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // ppl = exp(-rounded avg)
    assert(math.abs(got(1L)._4 - BigDecimal(math.exp(-got(1L)._3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("lmScore: reference-like text scores lower perplexity than noise") {
    val ref = Seq.tabulate(20)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val docs = Seq((100L, "the cat sat"), (101L, "qwfp zxcv mlkj"))
      .toDF("doc_id", "text")
    val got = LmOps.lmScore(docs, col("doc_id"), col("text"),
        LmOps.unigramCounts(ref, col("text")))
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(got(100L) < got(101L))
  }

  test("lmScore: zero-token documents are absent") {
    val ref = Seq((0L, "a")).toDF("doc_id", "text")
    val docs = Seq((1L, "a"), (2L, ""), (3L, "!!!")).toDF("doc_id", "text")
    val ids = LmOps.lmScore(docs, col("doc_id"), col("text"),
        LmOps.unigramCounts(ref, col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  // ---- bigram LM ----

  test("bigramModel: conditional probabilities with pre-prune context totals") {
    // ref "a b a b a c": bigrams (a b)x2 (b a)x2 (a c)x1 — ctx a total 3
    val ref = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val m = LmOps.bigramModel(ref, col("text"), minCount = 2)
      .as[(String, Double)].collect().toMap
    // (a c) pruned, but ctx-a denominator keeps its count: p(b|a) = 2/3
    assert(m.keySet === Set("a b", "b a"))
    assert(math.abs(m("a b") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(m("b a") - 2.0 / 2.0) < 1e-12)
  }

  test("bigramLmScore: hand-computed interpolation, pruned bigram backs off") {
    val ref = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val model = LmOps.bigramModel(ref, col("text"), minCount = 2)
    val uni = LmOps.unigramCounts(ref, col("text"))
    // uni: a=3 b=2 c=1, T=6, V=3 → pU(x) = (cnt+.1)/(6+.1*4)
    def pU(c: Long) = (c + 0.1) / 6.4
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "zz qq")).toDF("doc_id", "text")
    val got = LmOps.bigramLmScore(docs, col("doc_id"), col("text"), model, uni)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: seen bigram → 0.7*(2/3) + 0.3*pU(b)
    assert(math.abs(got(1L)._3 -
      r6(math.log(0.7 * (2.0 / 3.0) + (1 - 0.7) * pU(2)))) < 1e-9)
    // doc 2: (a c) pruned → pure unigram backoff of c
    assert(math.abs(got(2L)._3 -
      r6(math.log((1 - 0.7) * pU(1)))) < 1e-9)
    // doc 3: OOV everywhere → backoff with cnt=0, still finite
    assert(math.abs(got(3L)._3 -
      r6(math.log((1 - 0.7) * pU(0)))) < 1e-9)
    assert(got.values.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("bigramLmScore: sub-2-token documents absent; fluent text wins") {
    val ref = Seq.tabulate(20)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val model = LmOps.bigramModel(ref, col("text"))
    val uni = LmOps.unigramCounts(ref, col("text"))
    val docs = Seq((1L, "the cat sat"), (2L, "cat the mat on"), (3L, "one"))
      .toDF("doc_id", "text")
    val got = LmOps.bigramLmScore(docs, col("doc_id"), col("text"), model, uni)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L)) // doc 3 has no bigram
    // in-order reference bigrams beat shuffled ones
    assert(got(1L) < got(2L))
  }

  // ---- hashedLinearScore ----

  test("hashedLinearScore: hand-computed sigmoid over known weights") {
    // buckets=1 → every bigram hashes to bucket 0; weight 0.4, bias 0.1
    val docs = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val w = Seq((0L, 0.4)).toDF("bucket", "weight")
    val got = LmOps.hashedLinearScore(docs, col("doc_id"), col("text"), w,
        bias = 0.1, n = 2, buckets = 1)
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // doc 1: 2 bigrams, mean weight 0.4 → z = 0.5, σ = 0.622459
    assert(got(1L)._2 === 2L)
    assert(math.abs(got(1L)._3 - 1.0 / (1.0 + math.exp(-0.5))) < 1e-6)
    assert(got(1L)._4 === true)
    // doc 2: one token → no bigram features → absent
    assert(!got.contains(2L))
  }

  test("hashedLinearScore: buckets without a weight row contribute zero") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val none = spark.emptyDataset[(Long, Double)].toDF("bucket", "weight")
    val got = LmOps.hashedLinearScore(docs, col("doc_id"), col("text"), none,
        bias = 0.0, n = 2, buckets = 4)
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(got._3 === 0.5 && got._4 === true) // σ(0) = 0.5, pred is ≥
  }

  test("hashedLinearScore: negative-weight text scores below 0.5") {
    val docs = Seq((1L, "spam spam spam")).toDF("doc_id", "text")
    val w = spark.range(8).select(col("id").as("bucket"),
      lit(-1.0).as("weight"))
    val got = LmOps.hashedLinearScore(docs, col("doc_id"), col("text"), w,
        bias = 0.0, n = 2, buckets = 8)
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(got._3 < 0.5 && !got._4)
  }

  // ---- dsirWeights ----

  test("dsirWeights: target-like documents outweigh raw-typical ones") {
    // target: heavy "good text" bigrams; raw: mostly "bad noise" bigrams
    val target = Seq.tabulate(10)(i => (i.toLong, "good text good text"))
      .toDF("doc_id", "text")
    val raw = (Seq.tabulate(20)(i => (i.toLong, "bad noise bad noise")) ++
      Seq.tabulate(2)(i => (100L + i, "good text good text")))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "good text good"), (2L, "bad noise bad")).toDF("doc_id", "text")
    val got = LmOps.dsirWeights(docs, col("doc_id"), col("text"),
        target, raw, col("text"), col("text"))
      .select("doc_id", "dsir_logw").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L))
    assert(got(1L) > 0 && got(2L) < 0)
  }

  test("dsirWeightsSelfRaw is bit-identical to dsirWeights with raw = docs") {
    val rnd = new scala.util.Random(20260821)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def doc() = Seq.fill(4 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
      .mkString(" ")
    val docs = (1 to 150).map(i => (i.toLong, doc())).toDF("doc_id", "text")
    val target = (1 to 30).map(i => (i.toLong, doc())).toDF("doc_id", "text")
    val general = LmOps.dsirWeights(docs, col("doc_id"), col("text"),
        target, docs, col("text"), col("text"), n = 2, buckets = 64)
      .as[(Long, Long, Double)].collect().toSet
    val selfRaw = LmOps.dsirWeightsSelfRaw(docs, col("doc_id"), col("text"),
        target, col("text"), n = 2, buckets = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(selfRaw === general)
    assert(selfRaw.nonEmpty)
  }

  test("dsirWeights: a bucket unseen in both corpora contributes the smoothed " +
    "constant ln((Tr+aB)/(Tt+aB)), not zero") {
    val target = Seq((0L, "t t")).toDF("doc_id", "text")   // 1 bigram, Tt=1
    val raw = Seq((0L, "r r r")).toDF("doc_id", "text")    // 2 bigrams, Tr=2
    val docs = Seq((1L, "u1 u2")).toDF("doc_id", "text")   // bigram unseen in both
    val B = 64
    val got = LmOps.dsirWeights(docs, col("doc_id"), col("text"),
        target, raw, col("text"), col("text"), n = 2, buckets = B, alpha = 0.5)
      .select("dsir_logw").as[Double].head()
    val expect = math.log(0.5 / (1 + 0.5 * B)) - math.log(0.5 / (2 + 0.5 * B))
    assert(math.abs(got -
      BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("dsirWeights: documents with fewer than n tokens are absent") {
    val d = Seq((0L, "a b c")).toDF("doc_id", "text")
    val docs = Seq((1L, "solo"), (2L, "two toks")).toDF("doc_id", "text")
    val ids = LmOps.dsirWeights(docs, col("doc_id"), col("text"),
        d, d, col("text"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  // ---- temperatureSample ----

  private def skewedCorpus = {
    // 100 rows of "big", 10 of "small"
    val rows = (0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 110).map(i => (i.toLong, "small"))
    rows.toDF("doc_id", "source")
  }

  test("temperatureSample: a target above the corpus size keeps everything") {
    val got = graft.ext.CorpusOps.temperatureSample(skewedCorpus,
      col("doc_id"), col("source"), tau = 0.5, targetTotal = 10000)
    assert(got.count() === 110)
    assert(got.columns.toSeq === Seq("doc_id", "source"))
  }

  test("temperatureSample: tau < 1 keeps a larger fraction of the rare stratum") {
    def fracs(tau: Double): Map[String, Double] = {
      val kept = graft.ext.CorpusOps.temperatureSample(skewedCorpus,
          col("doc_id"), col("source"), tau, targetTotal = 40)
        .groupBy("source").count().as[(String, Long)].collect().toMap
      Map("big" -> kept.getOrElse("big", 0L) / 100.0,
        "small" -> kept.getOrElse("small", 0L) / 10.0)
    }
    val t1 = fracs(1.0)   // proportional: same rate for both strata
    val t0 = fracs(0.0)   // equal share: small stratum rate 20/10 -> capped 1.0
    assert(t0("small") > t1("small"))
    assert(t0("small") === 1.0) // 40/2 = 20 wanted from a 10-row stratum
    assert(t0("big") < t1("big"))
  }

  // ---- psiDrift ----

  test("psiDrift: identical snapshots give zero contribution per bin") {
    val snap = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val got = graft.ext.CorpusOps.psiDrift(snap, snap, col("src"), col("src"))
      .select("bin", "psi_contrib").as[(String, Double)].collect().toMap
    assert(got === Map("a" -> 0.0, "b" -> 0.0))
  }

  test("psiDrift: hand-computed contributions, one-sided bin stays finite") {
    // ref: a×3, b×1; cur: a×1, b×2, c×1 (c unseen in ref)
    val ref = Seq("a", "a", "a", "b").zipWithIndex.map(_.swap).toDF("id", "src")
    val cur = Seq("a", "b", "b", "c").zipWithIndex.map(_.swap).toDF("id", "src")
    val got = graft.ext.CorpusOps.psiDrift(ref, cur, col("src"), col("src"),
        alpha = 0.5)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def p(n: Long, t: Double) = (n + 0.5) / (t + 0.5 * 3)
    def contrib(nr: Long, nc: Long) = {
      val x = (p(nc, 4) - p(nr, 4)) * math.log(p(nc, 4) / p(nr, 4))
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("a")._2 === 3L && got("a")._3 === 1L)
    assert(math.abs(got("a")._4 - contrib(3, 1)) < 1e-9)
    assert(math.abs(got("c")._4 - contrib(0, 1)) < 1e-9)
    assert(got("c")._4 > 0 && !got("c")._4.isInfinite)
    // every contribution is non-negative ((p-q) and ln(p/q) share sign)
    assert(got.values.forall(_._4 >= 0))
  }

  test("psiDrift: a null bin on both sides is one bin, not two one-sided rows") {
    val ref = Seq((1L, null.asInstanceOf[String]), (2L, "a")).toDF("id", "src")
    val cur = Seq((3L, null.asInstanceOf[String]), (4L, "a")).toDF("id", "src")
    val got = graft.ext.CorpusOps.psiDrift(ref, cur, col("src"), col("src"))
      .as[(String, Long, Long, Double)].collect()
    assert(got.length === 2)
    val nullRow = got.find(_._1 == null).get
    assert(nullRow._2 === 1L && nullRow._3 === 1L && nullRow._4 === 0.0)
  }

  // ---- ksTest ----

  test("ksTest: hand-computed two-sample D with the smallest argmax value") {
    // ref: 1,2,3,4 (F steps .25 each); cur: 3,4,5,6
    // gaps at v=1:.25 2:.5 3:.5 4:.5 5:.25 6:0 → D=.5, at_val=2 (smallest)
    val ref = Seq(1, 2, 3, 4).zipWithIndex.map(_.swap).toDF("id", "x")
    val cur = Seq(3, 4, 5, 6).zipWithIndex.map(_.swap).toDF("id", "x")
    val got = graft.ext.CorpusOps.ksTest(ref, cur, col("x"), col("x"))
      .as[(Long, Long, Double, Double)].head()
    assert(got === ((4L, 4L, 0.5, 2.0)))
  }

  test("ksTest: identical samples give D = 0; nulls are excluded") {
    val a = Seq(Some(1), Some(2), None, Some(2)).zipWithIndex.map(_.swap)
      .toDF("id", "x")
    val got = graft.ext.CorpusOps.ksTest(a, a, col("x"), col("x"))
      .as[(Long, Long, Double, Double)].head()
    assert(got._1 === 3L && got._2 === 3L && got._3 === 0.0)
  }

  test("ksTest: the window only ever sees the distinct-value table") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("n_chars").isNotNull)
    val plan = graft.ext.CorpusOps.ksTest(
        df.where(col("doc_id") % 2 === 0), df.where(col("doc_id") % 2 === 1),
        col("n_chars"), col("n_chars"))
      .queryExecution.optimizedPlan.toString
    // the Window node's child must be the post-aggregate join, i.e. the
    // plan string shows Aggregate BELOW Window (corpus collapsed first)
    val wIdx = plan.indexOf("Window")
    assert(wIdx >= 0 && plan.indexOf("Aggregate", wIdx) > wIdx,
      s"window must run over aggregated distinct values:\n$plan")
  }

  // ---- jsDivergence ----

  test("jsDivergence: identical corpora give 0; disjoint give ln 2") {
    val a = Seq((1L, "x y z")).toDF("id", "text")
    val b = Seq((1L, "p q r")).toDF("id", "text")
    val same = graft.ext.CorpusOps.jsDivergence(a, a, col("text"), col("text"))
      .select("jsd").as[Double].head()
    assert(same === 0.0)
    val disj = graft.ext.CorpusOps.jsDivergence(a, b, col("text"), col("text"))
      .as[(Long, Long, Long, Double)].head()
    assert(disj._3 === 6L)
    assert(math.abs(disj._4 - math.log(2)) < 1e-6)
  }

  test("jsDivergence: hand-computed asymmetric-mass case") {
    // ref tokens: a a b (p_a=2/3, p_b=1/3); cur: a b b b (q_a=1/4, q_b=3/4)
    val ref = Seq((1L, "a a b")).toDF("id", "text")
    val cur = Seq((1L, "a b b b")).toDF("id", "text")
    def term(p: Double, m: Double) = if (p > 0) p * math.log(p / m) else 0.0
    val ma = (2.0 / 3 + 1.0 / 4) / 2; val mb = (1.0 / 3 + 3.0 / 4) / 2
    val want = (term(2.0 / 3, ma) + term(1.0 / 4, ma) +
      term(1.0 / 3, mb) + term(3.0 / 4, mb)) / 2
    val got = graft.ext.CorpusOps.jsDivergence(ref, cur, col("text"), col("text"))
      .as[(Long, Long, Long, Double)].head()
    assert(got._1 === 3L && got._2 === 4L && got._3 === 2L)
    assert(math.abs(got._4 -
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("temperatureSample: null-stratum rows form their own stratum instead " +
    "of vanishing") {
    val df = ((0 until 20).map(i => (i.toLong, "big")) ++
      (20 until 30).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("doc_id", "source")
    val kept = graft.ext.CorpusOps.temperatureSample(df, col("doc_id"),
        col("source"), tau = 0.5, targetTotal = 1000)
    assert(kept.count() === 30) // rate capped at 1.0 for both strata
    assert(kept.where(col("source").isNull).count() === 10)
  }

  test("temperatureSample: deterministic across invocations") {
    def ids = graft.ext.CorpusOps.temperatureSample(skewedCorpus,
        col("doc_id"), col("source"), tau = 0.5, targetTotal = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === ids)
    assert(ids.nonEmpty)
  }
}
