package graft

import org.apache.spark.sql.functions._

import graft.ext.{CorpusOps, QualityRules, TextOps}

/** Seeded property checks for the corpus-curation operators against
  * independent Scala reference computations — fixed seed, many cases in ONE
  * DataFrame per test (a Spark job per random case would be minutes; a
  * thousand rows through one job is milliseconds), per the repo's
  * deterministic-sampling rule. */
class CurationPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // mirrors TextOps.tokens
  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim match {
      case "" => Seq.empty
      case t  => t.split(" ").toSeq
    }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "x1", "y22", "zz", "longishword", "w")

  // each test owns its Random with a fixed seed: a shared sequential stream
  // would make every test's data depend on the draw count of every earlier
  // test (reorder/subset runs would silently change inputs)
  private def randDoc(rnd: scala.util.Random): String =
    Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("packSequences matches the next-fit reference on 500 random docs") {
    val rnd = new scala.util.Random(20260812)
    val docs = (1 to 500).map(i => (i.toLong, 1L + rnd.nextInt(300)))
    val got = CorpusOps.packSequences(docs.toDF("id", "nt"), col("id"),
        col("nt"), maxTokens = 128, numBuckets = 4)
      .select("doc_id", "bucket", "bin")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // independent reference: bucket from md5 hex prefix, md5-order running
    // sum within bucket, bin = floor(start offset / max)
    val expected = docs.map { case (id, nt) =>
      val h = md5hex(id.toString)
      (id, nt, h, java.lang.Long.parseLong(h.take(8), 16) % 4)
    }.groupBy(_._4).flatMap { case (bucket, members) =>
      var cum = 0L
      members.sortBy(m => (m._3, m._1)).map { case (id, nt, _, _) =>
        val start = cum
        cum += nt
        id -> ((bucket, math.floorDiv(start, 128L)))
      }
    }
    assert(got.size === 500)
    expected.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
  }

  test("stratifiedSample keep-sets are monotone in the rate and a subset " +
    "of the input") {
    val df = (1 to 1500).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "grp")
    def keeps(r0: Double, r1: Double, r2: Double): Set[Long] =
      CorpusOps.stratifiedSample(df, col("id"), col("grp"),
          Map("s0" -> r0, "s1" -> r1, "s2" -> r2), defaultRate = 0.0)
        .select("id").as[Long].collect().toSet
    val lo = keeps(0.2, 0.1, 0.4)
    val hi = keeps(0.6, 0.5, 0.9)
    assert(lo.subsetOf(hi), "md5-uniform keep decisions must nest as rates grow")
    assert(hi.subsetOf((1 to 1500).map(_.toLong).toSet))
  }

  test("gopherRules keep agrees with a direct Scala recomputation on 300 " +
    "random docs") {
    val rnd = new scala.util.Random(31337)
    val docs = (1 to 300).map(i => (i.toLong, randDoc(rnd)))
    val got = QualityRules.gopherRules(docs.toDF("id", "txt"), col("id"),
        col("txt"), minTokens = 8, maxTokens = 25,
        minMeanLenTenths = 30, maxMeanLenTenths = 60, maxDupPct = 65)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    docs.foreach { case (id, txt) =>
      val t = tokensOf(txt)
      val n = t.size.toLong
      val nd = t.distinct.size.toLong
      val nc = t.map(_.length).sum.toLong
      val expected = n >= 8 && n <= 25 &&
        nc * 10 >= n * 30 && nc * 10 <= n * 60 &&
        (n - nd) * 100 <= n * 65 && n > 0
      assert(got(id) === expected, s"doc $id: '$txt' n=$n nd=$nd nc=$nc")
    }
  }

  test("jaccard values match direct set computation for every emitted pair") {
    val rnd = new scala.util.Random(4242)
    // genuinely planted near-duplicates: docs (2p-1, 2p) SHARE a base (the
    // base must be drawn once per pair — regenerating it per doc would
    // leave only chance collisions and the property would ride on luck)
    val docs = (1 to 30).flatMap { p =>
      val base = Seq.fill(8)(vocab(rnd.nextInt(5))).mkString(" ")
      Seq((2L * p - 1, base),
        (2L * p, base + " " + vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("id", "txt")
    val sh = TextOps.explodeShingles(df, col("id"), col("txt"), k = 3)
    val sig = graft.ext.DedupOps.minhashSignature(sh, 12)
    val pairs = graft.ext.DedupOps.lshCandidates(
      graft.ext.DedupOps.lshBands(sig, 12, 4))
    val got = graft.ext.DedupOps.jaccard(pairs, sh)
      .as[(Long, Long, Double)].collect()
    // ~86% shingle overlap per planted pair ⇒ band-collision ≈ 0.98 each;
    // 30 pairs must yield a rich sample, not a lucky one or two
    assert(got.length >= 20, s"expected >=20 candidate pairs, got ${got.length}")
    val shingleSets: Map[Long, Set[String]] = docs.map { case (id, txt) =>
      val t = tokensOf(txt)
      id -> t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    got.foreach { case (a, b, j) =>
      val sa = shingleSets(a); val sb = shingleSets(b)
      val expected = BigDecimal(sa.intersect(sb).size.toDouble /
        (sa.size + sb.size - sa.intersect(sb).size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - expected) < 1e-9, s"pair ($a,$b)")
    }
  }

  test("contamination n_shared matches brute-force overlap counts") {
    val rnd = new scala.util.Random(998877)
    val docs = (1 to 80).map(i => (i.toLong, randDoc(rnd)))
    val df = docs.toDF("id", "txt")
    val isEval = (id: Long) => id % 10 == 0
    val sh = (d: org.apache.spark.sql.DataFrame) =>
      TextOps.explodeShingles(d, col("id"), col("txt"), k = 2)
    val got = CorpusOps.contamination(
        sh(df.where(col("id") % 10 =!= 0)), sh(df.where(col("id") % 10 === 0)),
        minShared = 1)
      .as[(Long, Long)].collect().toMap
    val shingles: Map[Long, Set[String]] = docs.map { case (id, txt) =>
      id -> tokensOf(txt).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    }.toMap
    val evalSh = docs.collect { case (id, _) if isEval(id) => shingles(id) }
      .foldLeft(Set.empty[String])(_ ++ _)
    docs.filterNot(d => isEval(d._1)).foreach { case (id, _) =>
      val expected = shingles(id).count(evalSh.contains).toLong
      if (expected >= 1) assert(got(id) === expected, s"doc $id")
      else assert(!got.contains(id), s"doc $id should be absent")
    }
  }
}
