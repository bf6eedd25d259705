package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.SetSimJoin
import graft.operators.FuzzyJoin

/** The 100-TB safety story, actually proven: every quadratic-risk operator
  * carries an unprunable `raise_error` guard, and these skew fixtures (a
  * hot key shared by more sets/strings than maxBucket allows) assert each
  * guard TRIPS with its documented message instead of silently
  * cross-joining. SetSimJoinSpec covers selfJoin's guard; this spec covers
  * the remaining guarded paths: rsJoin, containJoin, deletionJoin's
  * maxLen, and qgramJoin's gram-tier and short-tier bucket guards. */
class GuardSpec extends SparkTestBase {

  import spark.implicits._

  private def elemsOf(sets: Seq[(Long, Seq[String])]): DataFrame =
    sets.flatMap { case (id, es) => es.distinct.map(id -> _) }
      .toDF("doc_id", "elem")

  // one shingle shared by every set — the disguised-cross-join fixture
  private def hotShingleSets(n: Int): DataFrame =
    elemsOf((1L to n.toLong).map(id => id -> Seq("common")))

  test("rsJoin: hot prefix element shared by > maxBucket sets raises " +
    "with the documented message") {
    val ex = intercept[Exception] {
      SetSimJoin.rsJoin(hotShingleSets(10), hotShingleSets(10),
        theta = 0.9, maxBucket = 5).collect()
    }
    assert(ex.getMessage.contains("maxBucket=5") &&
      ex.getMessage.contains("disguised cross join"), ex.getMessage)
  }

  test("containJoin: the right-side FULL postings guard trips on a hot " +
    "element even when the left prefix is cold") {
    // left: distinct single-element sets (no hot prefix); right: every set
    // contains the shared element — only the right postings guard can fire
    val left = elemsOf((1L to 3L).map(id => id -> Seq(s"uniq$id")))
    val right = elemsOf((1L to 10L).map(id => id -> Seq("common", s"u$id")))
    val ex = intercept[Exception] {
      SetSimJoin.containJoin(left, right, theta = 0.9, maxBucket = 5)
        .collect()
    }
    assert(ex.getMessage.contains("right") &&
      ex.getMessage.contains("maxBucket=5"), ex.getMessage)
  }

  test("deletionJoin: a document-length string raises instead of fanning " +
    "out its variant neighbourhood") {
    val l = Seq((1L, "a" * 80)).toDF("id", "s")
    val r = Seq((2L, "short")).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.deletionJoin(l, col("id"), col("s"), r, col("id"), col("s"),
        maxDist = 1, maxLen = 64).collect()
    }
    assert(ex.getMessage.contains("maxLen=64") &&
      ex.getMessage.contains("length = 80"), ex.getMessage)
  }

  test("qgramJoin gram tier: a (gram, band) group over maxBucket raises " +
    "on the indexed side") {
    // 10 identical long-enough strings: every (gram, band) group on the
    // indexed side has 10 members > maxBucket = 3
    val l = Seq((0L, "abcdef")).toDF("id", "s")
    val r = (1L to 10L).map(i => (i, "abcdef")).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramJoin(l, col("id"), col("s"), r, col("id"), col("s"),
        maxDist = 1, q = 2, maxBucket = 3).collect()
    }
    assert(ex.getMessage.contains("maxBucket=3") &&
      ex.getMessage.contains("disguised cross join"), ex.getMessage)
  }

  test("qgramJoin short tier: a corpus dominated by one short length " +
    "raises instead of concentrating on one reducer") {
    // all strings shorter than the gram-survival threshold (q·(k+1) = 4)
    // with DISTINCT grams (doubled letters), so the gram-tier groups stay
    // size 1 and only the short tier's LENGTH banding is hot: one length-2
    // group of 10 > maxBucket
    val l = Seq((0L, "ab")).toDF("id", "s")
    val r = (1L to 10L).map(i => (i, s"${('a' + i).toChar}${('a' + i).toChar}"))
      .toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramJoin(l, col("id"), col("s"), r, col("id"), col("s"),
        maxDist = 1, q = 2, maxBucket = 3).collect()
    }
    assert(ex.getMessage.contains("short") &&
      ex.getMessage.contains("maxBucket=3"), ex.getMessage)
  }

  test("qgramJoin saturated keyspace: uniform growth with NO hot bucket " +
    "trips the volume guard and routes to the linear tiers") {
    // 200 DISTINCT binary-alphabet strings (8-bit representations): the
    // (gram, band) key space is 4 gram values x 4 bands, so every bucket
    // grows together as the corpus grows — each stays well under the
    // default maxBucket=100000 (the per-bucket guards CANNOT fire), while
    // total candidate volume Σ lc·rc is ~65 per gram row > maxAvgFanout.
    // This is the uniform-growth regime the per-bucket guard is blind to.
    def bin(i: Long): String =
      (7 to 0 by -1).map(b => if (((i >> b) & 1) == 1) 'b' else 'a').mkString
    val l = (0L until 200L).map(i => (i, bin(i))).toDF("id", "s")
    val r = (0L until 200L).map(i => (i + 1000L, bin(i))).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramJoin(l, col("id"), col("s"), r, col("id"), col("s"),
        maxDist = 1, q = 2).collect()
    }
    assert(ex.getMessage.contains("maxAvgFanout=16") &&
      ex.getMessage.contains("saturated") &&
      ex.getMessage.contains("deletionJoin") &&
      ex.getMessage.contains("sortedNeighborhood"), ex.getMessage)
    // same corpus, bound raised: results flow (the guard is a refusal of
    // the REGIME, not a correctness fence — candidates verify exactly)
    val ok = FuzzyJoin.qgramJoin(l, col("id"), col("s"), r, col("id"), col("s"),
      maxDist = 1, q = 2, maxAvgFanout = 1000)
    assert(ok.count() >= 200) // every string meets its own copy at dist 0
  }

  test("guards are silent on a legal (bounded-bucket) run") {
    // same shapes, buckets under the limit — results flow, no raise
    val ok = SetSimJoin.rsJoin(hotShingleSets(3), hotShingleSets(3),
      theta = 0.9, maxBucket = 100).count()
    assert(ok === 9) // identical singleton sets: all pairs match
    val fj = FuzzyJoin.qgramJoin(
      Seq((0L, "abcdef")).toDF("id", "s"), col("id"), col("s"),
      (1L to 3L).map(i => (i, "abcdef")).toDF("id", "s"), col("id"), col("s"),
      maxDist = 1, q = 2, maxBucket = 100).count()
    assert(fj === 3)
  }

  test("qgramJoin: an id type with no INT cast (date) analyzes and runs — " +
    "the volume-guard poison row must not force a castable id") {
    // the poison union row nulls l_id (the only constraint-free column),
    // so arbitrary id types survive analysis on legal joins...
    val l = Seq(("2024-01-01", "abcdef"), ("2024-01-02", "abcdxf"))
      .toDF("d", "s").select(to_date(col("d")).as("id"), col("s"))
    val r = Seq(("2024-02-01", "abcdef")).toDF("d", "s")
      .select(to_date(col("d")).as("id"), col("s"))
    val got = FuzzyJoin.qgramJoin(l, col("id"), col("s"),
      r, col("id"), col("s"), maxDist = 1, q = 2).count()
    assert(got === 2) // exact match + one-edit match
    // ...and the guard still FIRES with a date id (the raise must not
    // depend on the id being castable either)
    def bin(i: Long): String =
      (7 to 0 by -1).map(b => if (((i >> b) & 1) == 1) 'b' else 'a').mkString
    val ld = (0L until 200L).map(i => (java.sql.Date.valueOf("2024-01-01"), bin(i)))
      .toDF("id", "s")
    val rd = (0L until 200L).map(i => (java.sql.Date.valueOf("2024-02-01"), bin(i)))
      .toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramJoin(ld, col("id"), col("s"), rd, col("id"), col("s"),
        maxDist = 1, q = 2).collect()
    }
    assert(ex.getMessage.contains("maxAvgFanout=16"), ex.getMessage)
  }
}
