package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.SetSimJoin

/** Prefix-filtered exact set-similarity join: equivalence to the naive
  * all-pairs form (completeness of the prefix filter), threshold edge
  * behaviour, and the hot-element guard. */
class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def elemsOf(sets: Seq[(Long, Seq[String])]): DataFrame =
    sets.flatMap { case (id, es) => es.distinct.map(id -> _) }
      .toDF("doc_id", "elem")

  /** Naive reference: exact Jaccard over every pair, no filtering. */
  private def naive(sets: Seq[(Long, Seq[String])], theta: Double)
      : Set[(Long, Long, Double)] = {
    val m = sets.map { case (id, es) => id -> es.distinct.toSet }.toMap
    val ids = m.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = m(ids(i)); b = m(ids(j))
      ni = (a intersect b).size
      jac = ni.toDouble / (a.size + b.size - ni)
      if jac >= theta
    } yield (ids(i), ids(j),
      BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
  }

  private def run(sets: Seq[(Long, Seq[String])], theta: Double)
      : Set[(Long, Long, Double)] =
    SetSimJoin.selfJoin(elemsOf(sets), theta)
      .as[(Long, Long, Double)].collect().toSet

  test("matches the naive all-pairs join on a mixed fixture") {
    val sets = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "f"),   // J(1,2) = 4/6 = 0.6667
      3L -> Seq("a", "b", "c", "d", "e"),   // J(1,3) = 1.0
      4L -> Seq("x", "y", "z"),             // disjoint from the abc family
      5L -> Seq("x", "y", "z", "w"),        // J(4,5) = 3/4 = 0.75
      6L -> Seq("a", "x"),                  // small, low overlap with all
      7L -> Seq("q"))                       // singleton
    for (theta <- Seq(0.3, 0.5, 0.6, 0.75, 0.9, 1.0))
      assert(run(sets, theta) == naive(sets, theta), s"theta=$theta")
  }

  test("randomized: equals naive over seeded random sets at several thetas") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"e$i")
    val sets = (0L until 40L).map { id =>
      val base = rnd.shuffle(vocab).take(3 + rnd.nextInt(10))
      id -> base
    }
    // plant near-dups so high thetas are non-vacuous
    val planted = sets ++ Seq(
      100L -> sets(0)._2, 101L -> (sets(1)._2 :+ "extra"))
    for (theta <- Seq(0.4, 0.6, 0.8))
      assert(run(planted, theta) == naive(planted, theta), s"theta=$theta")
  }

  test("threshold boundary: a pair at exactly theta is kept") {
    val sets = Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "c", "d", "e"))   // J = 3/5 = 0.6 exactly
    assert(run(sets, 0.6) == Set((1L, 2L, 0.6)))
    assert(run(sets, 0.6000001).isEmpty)
  }

  test("positional filter: exact integer-boundary required overlap keeps " +
    "the pair (the raw-ceil float inflation regression)") {
    // sizes (3, 4), overlap 2 -> J = 2/5 = 0.4 exactly; the required
    // overlap theta/(1+theta)*(3+4) = 2.0000000000000004 in doubles — a
    // raw ceil demands 3 and silently drops the pair (the bug the first
    // positional-filter attempt shipped); the 6-dp round keeps it
    val sets = Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "d", "e"))
    assert(run(sets, 0.4) == Set((1L, 2L, 0.4)))
  }

  test("theta outside (0, 1] is rejected") {
    intercept[IllegalArgumentException](SetSimJoin.selfJoin(elemsOf(Seq()), 0.0))
    intercept[IllegalArgumentException](SetSimJoin.selfJoin(elemsOf(Seq()), 1.1))
  }

  /** Naive R-S reference: exact Jaccard over the full cross product. */
  private def naiveRs(l: Seq[(Long, Seq[String])], r: Seq[(Long, Seq[String])],
                      theta: Double): Set[(Long, Long, Double)] =
    (for {
      (li, ls) <- l; (ri, rs) <- r
      a = ls.distinct.toSet; b = rs.distinct.toSet
      ni = (a intersect b).size
      jac = ni.toDouble / (a.size + b.size - ni)
      if jac >= theta
    } yield (li, ri,
      BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

  test("rsJoin matches the naive cross-product join; overlapping id " +
    "spaces never couple across sides") {
    // id 1 exists on BOTH sides with different content — ids must stay
    // side-local
    val l = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("x", "y", "z"),
      3L -> Seq("p", "q"))
    val r = Seq(
      1L -> Seq("x", "y", "z", "w"),
      2L -> Seq("a", "b", "c", "d", "e"),
      9L -> Seq("p", "q"))
    for (theta <- Seq(0.4, 0.6, 0.8, 1.0)) {
      val got = SetSimJoin.rsJoin(elemsOf(l), elemsOf(r), theta)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == naiveRs(l, r, theta), s"theta=$theta")
    }
  }

  test("rsJoin randomized: equals naive on seeded random sets") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 25).map(i => s"e$i")
    def mk(n: Int) = (0L until n.toLong).map { id =>
      id -> rnd.shuffle(vocab).take(3 + rnd.nextInt(8))
    }
    val l = mk(25)
    // right side: some random, some near-copies of left sets
    val r = mk(20) ++ Seq(50L -> l(0)._2, 51L -> (l(1)._2 :+ "extra"))
    for (theta <- Seq(0.5, 0.8))
      assert(SetSimJoin.rsJoin(elemsOf(l), elemsOf(r), theta)
        .as[(Long, Long, Double)].collect().toSet == naiveRs(l, r, theta),
        s"theta=$theta")
  }

  /** Naive containment reference. */
  private def naiveContain(l: Seq[(Long, Seq[String])],
                           r: Seq[(Long, Seq[String])],
                           theta: Double): Set[(Long, Long, Double)] =
    (for {
      (li, ls) <- l; (ri, rs) <- r
      a = ls.distinct.toSet; b = rs.distinct.toSet
      c = (a intersect b).size.toDouble / a.size
      if c >= theta
    } yield (li, ri,
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

  test("containJoin: asymmetric — a small doc inside a big container " +
    "matches even at low Jaccard; equals naive at several thetas") {
    val l = Seq(
      1L -> Seq("a", "b"),                       // fully inside r10
      2L -> Seq("a", "b", "q", "r", "s"),        // only 2/5 inside r10
      3L -> Seq("z"))                            // nowhere
    val r = Seq(
      10L -> Seq("a", "b", "c", "d", "e", "f", "g", "h"),
      11L -> Seq("q", "r"))
    // Jaccard(1, 10) = 2/8 = 0.25 — the symmetric join would miss it
    assert(naiveRs(l, r, 0.5).isEmpty)
    for (theta <- Seq(0.4, 0.7, 1.0)) {
      val got = SetSimJoin.containJoin(elemsOf(l), elemsOf(r), theta)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == naiveContain(l, r, theta), s"theta=$theta")
    }
    assert(SetSimJoin.containJoin(elemsOf(l), elemsOf(r), 1.0)
      .as[(Long, Long, Double)].collect().toSet ==
      Set((1L, 10L, 1.0)))
  }

  test("containJoin randomized: equals naive on seeded random sets") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 30).map(i => s"e$i")
    val l = (0L until 20L).map(id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(5)))
    val r = (0L until 15L).map(id =>
      id -> rnd.shuffle(vocab).take(6 + rnd.nextInt(12)))
    for (theta <- Seq(0.5, 0.8))
      assert(SetSimJoin.containJoin(elemsOf(l), elemsOf(r), theta)
        .as[(Long, Long, Double)].collect().toSet ==
        naiveContain(l, r, theta), s"theta=$theta")
  }

  test("hot prefix element raises loudly instead of cross-joining") {
    // every set is {common}, so the prefix element "common" is shared by
    // all 10 sets — over maxBucket=5, the guard must fire
    val sets = (1L to 10L).map(id => id -> Seq("common"))
    val ex = intercept[Exception] {
      SetSimJoin.selfJoin(elemsOf(sets), 0.9, maxBucket = 5).collect()
    }
    assert(ex.getMessage.contains("maxBucket"))
  }
}
