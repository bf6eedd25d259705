package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      points("k") === intervals("k") &&
        col("pt") >= col("st") && col("pt") < col("en"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet

  test("pointInInterval matches the naive inequality join, with half-open " +
    "bounds, multi-bucket intervals, empty and null intervals") {
    val points = Seq(
      (1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 99L), (4L, 1L, 100L),
      (5L, 2L, 50L), (6L, 3L, 50L), (7L, 1L, 250L))
      .toDF("pid", "k", "pt")
    val intervals = Seq(
      (10L, 1L, Some(0L), Some(100L)),    // [0,100): pids 1,2,3; NOT 4 (end-exclusive)
      (11L, 1L, Some(10L), Some(10L)),    // empty
      (12L, 1L, Some(200L), Some(100L)),  // inverted → empty
      (13L, 2L, Some(0L), Some(1000L)),   // multi-bucket (100 buckets at w=10)
      (14L, 3L, None, Some(100L)),        // null start → drops
      (15L, 1L, Some(240L), Some(260L)))  // [240,260): pid 7
      .toDF("iid", "k", "st", "en")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en",
        bucketWidth = 10L, keys = Seq("k"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got === naive(points, intervals))
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 10L), (5L, 13L), (7L, 15L)))
  }

  test("pointInInterval without keys joins on the bucket alone") {
    val points = Seq((1L, 5L), (2L, 25L)).toDF("pid", "pt")
    val intervals = Seq((10L, 0L, 10L), (11L, 20L, 30L)).toDF("iid", "st", "en")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en",
        bucketWidth = 10L)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 11L)))
  }

  test("an interval spanning more than maxBucketsPerInterval buckets " +
    "raises instead of silently exploding") {
    val points = Seq((1L, 5L)).toDF("pid", "pt")
    val intervals = Seq((10L, 0L, 1000L)).toDF("iid", "st", "en")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", intervals, "st", "en",
        bucketWidth = 10L, maxBucketsPerInterval = 50).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("disguised cross join") ||
        Option(e.getCause).exists(_.getMessage.contains("disguised cross join"))),
      s"unexpected error: $e")
  }

  test("a qualifying pair meets in exactly ONE bucket — no duplicate rows " +
    "even when the interval covers many buckets") {
    val points = Seq((1L, 1L, 555L)).toDF("pid", "k", "pt")
    val intervals = Seq((10L, 1L, 0L, 1000L)).toDF("iid", "k", "st", "en")
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en",
      bucketWidth = 10L, keys = Seq("k"))
    assert(out.count() === 1L)
  }

  test("intervalOverlap matches the naive inequality join with NO " +
    "duplicate pairs, even when the overlap region spans many buckets") {
    val left = Seq(
      (1L, 1L, 0L, 100L),     // overlaps 10 (first-common bucket mid-range)
      (2L, 1L, 500L, 600L),   // disjoint from everything
      (3L, 2L, 0L, 1000L),    // overlaps 11 over 40 shared buckets
      (4L, 1L, 90L, 95L))     // nested inside 10's [50,200)
      .toDF("lid", "k", "ls", "le")
    val right = Seq(
      (10L, 1L, 50L, 200L),
      (11L, 2L, 600L, 2000L),
      (12L, 3L, 0L, 100L))    // key with no left rows
      .toDF("rid", "k", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
        bucketWidth = 10L, keys = Seq("k"))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSeq
    val naive = left.join(right, left("k") === right("k") &&
        col("ls") < col("re") && col("rs") < col("le"))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSeq
    assert(got.sorted === naive.sorted) // Seq compare: duplicates would fail
    assert(got.toSet === Set((1L, 10L), (3L, 11L), (4L, 10L)))
  }

  test("intervalOverlap: touching endpoints do NOT overlap (half-open), " +
    "single-instant overlap DOES") {
    val left = Seq((1L, 0L, 100L), (2L, 0L, 101L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 100L, 200L)).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
        bucketWidth = 7L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 10L))) // [0,100) ∩ [100,200) empty; [0,101) hits
  }

  test("property: both joins match their naive forms on random data with " +
    "NEGATIVE axis values and varied bucket widths (floor-division " +
    "consistency across the zero boundary)") {
    val rnd = new scala.util.Random(20260813)
    def interval(): (Long, Long) = {
      val s = rnd.nextLong() % 500 // negative and positive starts
      (s, s + rnd.nextInt(120))    // includes empty (len 0) intervals
    }
    val points = (1L to 150L).map { i =>
      (i, (rnd.nextInt(3) + 1).toLong, (rnd.nextLong() % 500))
    }.toDF("pid", "k", "pt")
    val ivs = (1L to 60L).map { i =>
      val (s, e) = interval(); (i, (rnd.nextInt(3) + 1).toLong, s, e)
    }.toDF("iid", "k", "st", "en")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val gotP = RangeJoin.pointInInterval(points, "pt", ivs, "st", "en",
          bucketWidth = w, keys = Seq("k"))
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSeq
      val naiveP = points.join(ivs, points("k") === ivs("k") &&
          col("pt") >= col("st") && col("pt") < col("en"))
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSeq
      assert(gotP.sorted === naiveP.sorted, s"pointInInterval w=$w")
      val ivs2 = ivs.select(col("iid").as("jid"), col("k"),
        col("st").as("st2"), col("en").as("en2"))
      val gotI = RangeJoin.intervalOverlap(ivs, "st", "en",
          ivs2, "st2", "en2", bucketWidth = w, keys = Seq("k"))
        .select(col("iid"), col("jid")).as[(Long, Long)].collect().toSeq
      val naiveI = ivs.join(ivs2, ivs("k") === ivs2("k") &&
          col("st") < col("en2") && col("st2") < col("en"))
        .select(col("iid"), col("jid")).as[(Long, Long)].collect().toSeq
      assert(gotI.sorted === naiveI.sorted, s"intervalOverlap w=$w")
    }
  }

  test("x_range_join and x_interval_join (window joins over events) have " +
    "no nested-loop join and no cartesian — the equi-rewrite is the point") {
    for (q <- Seq("x_range_join", "x_interval_join")) {
      val p = SparkEntry.queries(q)(spark, sf("sf0.001"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }
}
