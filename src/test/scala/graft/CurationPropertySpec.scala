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

  test("chunkDedup invariants on 300 random docs: counts bound, clean_text " +
    "is the kept-chunk concatenation, every distinct chunk survives exactly once") {
    import graft.ext.RepetitionOps
    val rnd = new scala.util.Random(20260813)
    val docs = (1 to 300).map(i => (i.toLong, randDoc(rnd)))
    val c = 4
    val got = RepetitionOps.chunkDedup(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), c)
      .as[(Long, Long, Long, String)].collect()
    // reference chunking
    val chunksOf = docs.map { case (id, t) =>
      id -> tokensOf(t).grouped(c).map(_.mkString(" ")).toSeq
    }.toMap
    assert(got.map(_._1).toSet === chunksOf.filter(_._2.nonEmpty).keySet)
    // exact reference: global first-occurrence winner per distinct chunk
    val winner = chunksOf.toSeq
      .flatMap { case (id, chs) => chs.zipWithIndex.map { case (ch, ix) =>
        (ch, id * 1048576L + ix) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    got.foreach { case (id, nChunks, nKept, clean) =>
      val chs = chunksOf(id)
      val kept = chs.zipWithIndex
        .filter { case (ch, ix) => winner(ch) == id * 1048576L + ix }
      assert(nChunks === chs.length.toLong)
      assert(nKept === kept.length.toLong, s"doc $id")
      assert(clean === kept.map(_._1).mkString(" "), s"doc $id")
    }
    // global: every distinct chunk string is kept exactly once corpus-wide
    assert(got.map(_._3).sum === winner.size.toLong)
  }

  test("deletionJoin equals the brute-force levenshtein join for k=1 and " +
    "k=2 on random short strings") {
    import graft.operators.FuzzyJoin
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(20260819)
    def randStr() =
      Seq.fill(3 + rnd.nextInt(6))("abcd"(rnd.nextInt(4))).mkString
    val left = (1 to 80).map(i => (i.toLong, randStr()))
    val right = (1 to 80).map(i => (1000L + i, randStr()))
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.deletionJoin(
          left.toDF("id", "s"), col("id"), col("s"),
          right.toDF("id", "s"), col("id"), col("s"), k)
        .as[(Long, Long, Int)].collect().toSet
      val expected = (for {
        (li, ls) <- left; (ri, rs) <- right
        d = lev(ls, rs) if d <= k
      } yield (li, ri, d)).toSet
      assert(got === expected, s"k=$k")
      assert(expected.nonEmpty, "vacuous corpus — no pairs within distance")
    }
  }

  test("deletionJoin fails loudly on strings beyond maxLen (variant fan-out " +
    "guard)") {
    import graft.operators.FuzzyJoin
    val long = Seq((1L, "x" * 100)).toDF("id", "s")
    val short = Seq((2L, "abc")).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.deletionJoin(long, col("id"), col("s"),
        short, col("id"), col("s"), maxDist = 1, maxLen = 64).collect()
    }
    assert(ex.getMessage.contains("maxLen") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxLen")), ex.getMessage)
  }

  test("chunkDedup fails loudly on doc_id magnitudes that would overflow " +
    "the winner encoding (hash-derived 63-bit ids must not corrupt silently)") {
    import graft.ext.RepetitionOps
    val df = Seq((1L << 44, "alpha beta gamma delta"), (7L, "alpha beta"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      RepetitionOps.chunkDedup(df, col("doc_id"), col("text"), c = 2).collect()
    }
    assert(ex.getMessage.contains("2^43") ||
      Option(ex.getCause).exists(_.getMessage.contains("2^43")), ex.getMessage)
  }

  test("deletionJoin ignores NULL strings instead of crashing on the maxLen " +
    "guard (NULL length must fall through to the pass branch)") {
    import graft.operators.FuzzyJoin
    val left = Seq((1L, Some("abc")), (2L, None), (3L, Some("abd")))
      .toDF("id", "s")
    val right = Seq((10L, Some("abc")), (11L, None)).toDF("id", "s")
    val got = FuzzyJoin.deletionJoin(left, col("id"), col("s"),
        right, col("id"), col("s"), maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    // NULL rows on either side simply never match; non-null pairs unaffected.
    assert(got === Set((1L, 10L, 0), (3L, 10L, 1)))
  }

  test("topOneLeft: broadcast and deletion forms are output-identical on a " +
    "large-layer fixture, and the deletion form plans WITHOUT a " +
    "nested-loop join") {
    import graft.operators.FuzzyJoin
    val rnd = new scala.util.Random(20260821)
    def name() = Seq.fill(4 + rnd.nextInt(4))("abcde"(rnd.nextInt(5))).mkString
    // the "large layer": 300 distinct names, each with a payload column —
    // plus over-long outliers (> default maxLen 64) that the broadcast form
    // scores and the deletion form must route through its long-tail band
    // instead of crashing (the ADVICE maxLen-divergence scenario)
    val longName = "L" * 70
    val edgeName = "m" * 64
    val layer = ((1 to 600).map(_ => name()).distinct ++ Seq(longName, edgeName))
      .map(n => (n, s"wkt_$n")).toDF("layer_name", "cell_wkt")
    // probes: corrupted copies of layer names + unmatchable free text + null
    val layerNames = layer.select("layer_name").as[String].collect()
    val longProbes = Seq(
      301L -> Option(longName),            // exact over-long match (dist 0)
      302L -> Option(longName.drop(1)),    // 69 chars, dist 1, both long
      303L -> Option(edgeName + "mm"),     // 66 vs 64 chars: crosses maxLen
      304L -> Option("q" * 65))            // over-long, unmatchable
    val probes = ((1 to 200).map { i =>
      val s =
        if (i % 3 == 0) Option(layerNames(rnd.nextInt(layerNames.length)).drop(1))
        else if (i % 3 == 1) Option(s"zzzz$i")
        else if (i % 17 == 0) None
        else Option(layerNames(rnd.nextInt(layerNames.length)))
      (i.toLong, s)
    } ++ longProbes).toDF("id", "txt")
    def run(bcast: Boolean) = FuzzyJoin.topOneLeft(probes, "id", "txt",
        layer, "layer_name", maxDist = 2, broadcastRight = Some(bcast))
      .select("id", "layer_name", "cell_wkt")
      .as[(Long, Option[String], Option[String])].collect().toSet
    assert(run(true) === run(false))
    assert(run(true).exists(_._2.isDefined) && run(true).exists(_._2.isEmpty),
      "fixture must exercise both matched and null-extended probes")
    val p = FuzzyJoin.topOneLeft(probes, "id", "txt", layer, "layer_name",
        maxDist = 2, broadcastRight = Some(false))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("qgramJoin (maxDist ≥ 3 tier) is output-identical to the plain " +
    "levenshtein cross join across distances 3 and 5, short strings, " +
    "empties, and NULLs") {
    import graft.operators.FuzzyJoin
    val rnd = new scala.util.Random(20260813)
    def word() = Seq.fill(2 + rnd.nextInt(14))("abcdef"(rnd.nextInt(6))).mkString
    // left: random words + an empty + a NULL + sub-threshold shorties
    val left = ((1 to 120).map(i => (i.toLong, Option(word()))) ++
      Seq(900L -> Option(""), 901L -> None, 902L -> Option("ab"),
        903L -> Option("abcde"))).toDF("id", "s")
    // right: corruptions of random words (likely hits) + its own tail cases
    val right = ((1 to 120).map { i =>
      val w = word()
      val cut = if (w.length > 3) w.drop(2).dropRight(1) else w
      (1000L + i, Option(cut))
    } ++ Seq(990L -> Option(""), 991L -> None, 992L -> Option("ba"),
      993L -> Option("abde"))).toDF("rid", "rs")
    for (k <- Seq(3, 5)) {
      val fast = FuzzyJoin.qgramJoin(left, col("id"), col("s"),
          right, col("rid"), col("rs"), maxDist = k)
        .as[(Long, Long, Int)].collect().toSet
      val naive = left.join(right,
          levenshtein(col("s"), col("rs")) <= k)
        .select(col("id"), col("rid"),
          levenshtein(col("s"), col("rs")).as("d"))
        .as[(Long, Long, Int)].collect().toSet
      assert(fast === naive, s"maxDist=$k: q-gram tier diverged " +
        s"(missing=${naive.diff(fast).take(5)}, extra=${fast.diff(naive).take(5)})")
      assert(naive.nonEmpty, "fixture must produce matches")
    }
  }

  test("qgramJoin raises loudly on a hot (gram, band) group — the disguised " +
    "cross join a low-entropy key produces must not run silently") {
    import graft.operators.FuzzyJoin
    // every string shares the same leading grams -> one (gram, band) group
    // holds the whole corpus
    val hot = (1 to 50).map(i => (i.toLong, s"aaaaaaaa$i")).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramJoin(hot, col("id"), col("s"),
        hot.select(col("id").as("rid"), col("s").as("rs")), col("rid"),
        col("rs"), maxDist = 3, maxBucket = 10).collect()
    }
    assert(ex.getMessage.contains("maxBucket") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxBucket")),
      ex.getMessage)
  }

  test("qgramJoin short tier raises on an all-short corpus — the length " +
    "band has ≤ q·(k+1)−1 keys, so short-dominated input must not " +
    "silently concentrate a cross join onto them") {
    import graft.operators.FuzzyJoin
    // maxDist=3, q=2 ⇒ survival threshold 8: every 5-char string is in the
    // short tier, and they all share one length key. Strings are RANDOM so
    // no (gram, band) group gets hot — only the short tier's guard can
    // fire, making the asserted message deterministic.
    val rnd = new scala.util.Random(20260813)
    val short = (1 to 40)
      .map(i => (i.toLong, Seq.fill(5)(('a' + rnd.nextInt(26)).toChar).mkString))
      .toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramJoin(short, col("id"), col("s"),
        short.select(col("id").as("rid"), col("s").as("rs")), col("rid"),
        col("rs"), maxDist = 3, maxBucket = 10).collect()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("short-tier"), ex.getMessage)
    // and below the bound the same corpus still verifies exactly: every
    // pair within distance 3 of another 5-char key
    val ok = FuzzyJoin.qgramJoin(short, col("id"), col("s"),
      short.select(col("id").as("rid"), col("s").as("rs")), col("rid"),
      col("rs"), maxDist = 3, maxBucket = 100000)
      .collect()
    assert(ok.nonEmpty)
  }

  test("topOneLeft auto-dispatch: with no knob set, the broadcast gate " +
    "follows the session threshold — disabled broadcasts plan the " +
    "distributed form, enabled ones the nested-loop form") {
    import graft.operators.FuzzyJoin
    val layer = (1 to 50).map(i => (s"name$i", s"wkt$i"))
      .toDF("layer_name", "cell_wkt")
    val probes = (1 to 20).map(i => (i.toLong, s"name$i")).toDF("id", "txt")
    def planStr(): String = FuzzyJoin.topOneLeft(probes, "id", "txt",
      layer, "layer_name", maxDist = 2)
      .queryExecution.executedPlan.toString
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      // a "large" right side: threshold disabled ⇒ every estimate is past
      // the gate ⇒ the naive call must NOT get the |L|×|R| nested-loop
      spark.conf.set(key, "-1")
      assert(!planStr().contains("BroadcastNestedLoopJoin"), planStr())
      // a genuinely small right side under the default gate keeps the
      // classic broadcast form
      spark.conf.set(key, "10MB")
      assert(planStr().contains("BroadcastNestedLoopJoin"), planStr())
    } finally spark.conf.set(key, old)
    // the explicit knob still overrides the gate in both directions
    spark.conf.set(key, "-1")
    try {
      val forced = FuzzyJoin.topOneLeft(probes, "id", "txt", layer,
        "layer_name", maxDist = 2, broadcastRight = Some(true))
        .queryExecution.executedPlan.toString
      assert(forced.contains("BroadcastNestedLoopJoin"), forced)
    } finally spark.conf.set(key, old)
  }

  test("topOneLeft at maxDist ≥ 3: the non-broadcast form dispatches to " +
    "the q-gram tier and stays output-identical to the broadcast form") {
    import graft.operators.FuzzyJoin
    val rnd = new scala.util.Random(20260814)
    def name() = Seq.fill(8 + rnd.nextInt(8))("abcdefgh"(rnd.nextInt(8))).mkString
    val layer = (1 to 400).map(_ => name()).distinct
      .map(n => (n, s"wkt_$n")).toDF("layer_name", "cell_wkt")
    val layerNames = layer.select("layer_name").as[String].collect()
    val probes = (1 to 150).map { i =>
      val s =
        if (i % 3 == 0) // 3-edit corruption: needs the maxDist ≥ 3 tier
          Option(layerNames(rnd.nextInt(layerNames.length)).drop(2) + "x")
        else if (i % 3 == 1) Option(s"zzzzzzzz$i")
        else if (i % 17 == 0) None
        else Option(layerNames(rnd.nextInt(layerNames.length)))
      (i.toLong, s)
    }.toDF("id", "txt")
    def run(bcast: Boolean) = FuzzyJoin.topOneLeft(probes, "id", "txt",
        layer, "layer_name", maxDist = 4, broadcastRight = Some(bcast))
      .select("id", "layer_name", "cell_wkt")
      .as[(Long, Option[String], Option[String])].collect().toSet
    assert(run(true) === run(false))
    assert(run(true).exists(_._2.isDefined) && run(true).exists(_._2.isEmpty),
      "fixture must exercise both matched and null-extended probes")
  }

  test("chunkDedup raises on doc_id = Long.MinValue (abs overflow must not " +
    "slip past the winner-encoding guard) and null-propagates NULL doc_id") {
    import graft.ext.RepetitionOps
    val minVal = Seq((Long.MinValue, "alpha beta gamma delta"), (7L, "alpha beta"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      RepetitionOps.chunkDedup(minVal, col("doc_id"), col("text"), c = 2).collect()
    }
    assert(ex.getMessage.contains("2^43") ||
      Option(ex.getCause).exists(_.getMessage.contains("2^43")), ex.getMessage)
    // A NULL doc_id must not raise — the guard null-propagates and the row
    // lands in the null group, matching pre-guard behaviour.
    val withNull = Seq((Some(7L), "alpha beta"), (None, "alpha beta"))
      .toDF("doc_id", "text")
    val rows = RepetitionOps.chunkDedup(withNull, col("doc_id"), col("text"),
      c = 2).collect()
    assert(rows.length === 2)
  }

  test("domainRebalance output is identical to the single-window reference " +
    "for random caps and any input partitioning (the pre-cap never drops a " +
    "global survivor)") {
    var nextId = 0L
    val rows = Seq("s0" -> 700, "s1" -> 53, "s2" -> 3, "s3" -> 1).flatMap {
      case (s, n) => (0 until n).map { _ => nextId += 1; (nextId, s) }
    }
    val df = rows.toDF("id", "src")
    def reference(cap: Int): Set[Long] = rows.groupBy(_._2).values.flatMap(g =>
      g.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(cap).map(_._1))
      .toSet
    for (cap <- Seq(1, 7, 60); parts <- Seq(1, 5, 32)) {
      val got = CorpusOps.domainRebalance(df.repartition(parts),
          col("id"), col("src"), cap)
        .select("id").as[Long].collect().toSet
      assert(got === reference(cap), s"cap=$cap parts=$parts")
    }
  }

  test("weightedSamplePerStratum matches the JVM A-ES-per-stratum " +
    "reference for any input partitioning, and caps every stratum at k") {
    var nextId = 0L
    val rows = Seq("s0" -> 300, "s1" -> 40, "s2" -> 2).flatMap {
      case (s, n) => (0 until n).map { _ =>
        nextId += 1; (nextId, s, nextId % 17 + 1) // weight 1..17
      }
    }
    val df = rows.toDF("id", "src", "w")
    def esk(id: Long, w: Long): Double = {
      val u = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) /
        4294967296.0
      BigDecimal(-math.log(math.max(u, 1e-12)) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def reference(k: Int): Set[Long] = rows.groupBy(_._2).values.flatMap(g =>
      g.sortBy { case (id, _, w) => (esk(id, w), id) }.take(k).map(_._1))
      .toSet
    for (k <- Seq(1, 5); parts <- Seq(1, 7)) {
      val got = CorpusOps.weightedSamplePerStratum(df.repartition(parts),
          col("id"), col("src"), col("w"), k)
        .select("id", "src").as[(Long, String)].collect()
      assert(got.map(_._1).toSet === reference(k), s"k=$k parts=$parts")
      assert(got.groupBy(_._2).values.forall(_.length <= k))
    }
  }

  test("assignSplit partitions every row into exactly one split with the " +
    "boundary arithmetic of the md5 uniform") {
    val rnd = new scala.util.Random(20260814)
    val ids = (1 to 1000).map(_ => rnd.nextLong().abs)
    val got = CorpusOps.assignSplit(ids.toDF("id"), col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.size === ids.distinct.size)
    val expected = ids.distinct.map { id =>
      val u = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) / 4294967296.0
      id -> (if (u < 0.8) "train" else if (u < 0.8 + 0.1) "val" else "test")
    }.toMap
    assert(got === expected)
    // all three splits non-empty at n=1000 (fails only if md5 were broken)
    assert(got.values.toSet === Set("train", "val", "test"))
  }

  test("temperatureSample: per-stratum keep counts match the rate-filter " +
    "reference on a skewed corpus") {
    val strata = Seq("s0" -> 400, "s1" -> 100, "s2" -> 25, "s3" -> 4)
    val rows = strata.flatMap { case (s, n) =>
      (0 until n).map(i => (s.hashCode.toLong * 1000 + i, s))
    }
    val tau = 0.5; val target = 200L
    val got = CorpusOps.temperatureSample(rows.toDF("id", "src"),
        col("id"), col("src"), tau, target)
      .select("id", "src").as[(Long, String)].collect()
    // reference: rate_s = min(1, round(n^tau/Z * T/n, 6)); u < rate
    val z = strata.map { case (_, n) => math.pow(n, tau) }.sum
    val expected = rows.filter { case (id, s) =>
      val n = strata.toMap.apply(s).toDouble
      val rate = math.min(1.0, BigDecimal(math.pow(n, tau) / z * target / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val u = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) / 4294967296.0
      u < rate
    }.toSet
    assert(got.toSet === expected)
    assert(got.nonEmpty)
  }

  test("lmScore matches a direct add-alpha reference on 300 random docs") {
    import graft.ext.LmOps
    val rnd = new scala.util.Random(20260815)
    val refDocs = (1 to 60).map(i => (i.toLong, randDoc(rnd)))
    val docs = (1000 to 1300).map(i => (i.toLong, randDoc(rnd)))
    val alpha = 0.1
    val got = LmOps.lmScore(docs.toDF("doc_id", "text"), col("doc_id"),
        col("text"), LmOps.unigramCounts(refDocs.toDF("doc_id", "text"),
          col("text")), alpha)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // reference model
    val cnts = refDocs.flatMap(d => tokensOf(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = cnts.values.sum.toDouble
    val v = cnts.size.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val toks = tokensOf(text)
      if (toks.isEmpty) assert(!got.contains(id))
      else {
        val lps = toks.map(tk =>
          math.log((cnts.getOrElse(tk, 0L) + alpha) / (t + alpha * (v + 1))))
        val (_, nTok, avgLp, ppl) = got(id)
        assert(nTok === toks.length.toLong, s"doc $id")
        assert(math.abs(avgLp - r6(lps.sum / lps.length)) < 1e-9, s"doc $id")
        assert(math.abs(ppl - BigDecimal(math.exp(-r6(lps.sum / lps.length)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"doc $id")
      }
    }
  }

  test("dsirWeights matches a direct hashed-bigram log-ratio reference on " +
    "200 random docs") {
    import graft.ext.LmOps
    val rnd = new scala.util.Random(20260816)
    val target = (1 to 40).map(i => (i.toLong, randDoc(rnd)))
    val raw = (100 to 200).map(i => (i.toLong, randDoc(rnd)))
    val docs = (1000 to 1200).map(i => (i.toLong, randDoc(rnd)))
    val (n, b, alpha) = (2, 64, 0.5)
    val got = LmOps.dsirWeights(docs.toDF("doc_id", "text"), col("doc_id"),
        col("text"), target.toDF("doc_id", "text"), raw.toDF("doc_id", "text"),
        col("text"), col("text"), n, b, alpha)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def bigrams(text: String): Seq[String] =
      tokensOf(text).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    def bucket(ng: String): Long =
      java.lang.Long.parseLong(md5hex(ng).take(8), 16) % b
    def counts(corpus: Seq[(Long, String)]): Map[Long, Long] =
      corpus.flatMap(d => bigrams(d._2)).map(bucket)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = counts(target); val rc = counts(raw)
    val tt = tc.values.sum.toDouble; val tr = rc.values.sum.toDouble
    def lr(bk: Long): Double =
      math.log((tc.getOrElse(bk, 0L) + alpha) / (tt + alpha * b)) -
        math.log((rc.getOrElse(bk, 0L) + alpha) / (tr + alpha * b))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val ngs = bigrams(text)
      if (ngs.isEmpty) assert(!got.contains(id))
      else {
        val (_, nNg, w) = got(id)
        assert(nNg === ngs.length.toLong, s"doc $id")
        assert(math.abs(w - r6(ngs.map(g => lr(bucket(g))).sum)) < 1e-6, s"doc $id")
      }
    }
  }

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
