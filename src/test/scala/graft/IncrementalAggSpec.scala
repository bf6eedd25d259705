package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Mergeable-state aggregate maintenance: the split invariant, null
  * handling, and the degenerate-variance guards. */
class IncrementalAggSpec extends SparkTestBase {

  import spark.implicits._

  // (k, batch, v): key "solo" has n=1; "flat" zero variance; "holes" nulls
  private def rows(): DataFrame = Seq(
    ("a", 0, Some(1.0)), ("a", 0, Some(3.0)), ("a", 1, Some(5.0)),
    ("a", 2, Some(7.0)),
    ("solo", 1, Some(42.0)),
    ("flat", 0, Some(2.0)), ("flat", 2, Some(2.0)), ("flat", 2, Some(2.0)),
    ("holes", 0, None), ("holes", 1, Some(10.0)), ("holes", 2, None))
    .toDF("k", "batch", "v")

  private def got(df: DataFrame): Map[String, (Long, Option[Double], Option[Double], Option[Double], Option[Double])] =
    df.as[(String, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  test("split invariant: merged partials equal the direct aggregate") {
    val all = rows()
    val direct = got(IncrementalAgg.finalize(
      IncrementalAgg.state(all, Seq("k"), col("v")), Seq("k")))
    for (cut <- Seq(0, 1, 2)) {
      val merged = IncrementalAgg.finalize(
        IncrementalAgg.merge(
          IncrementalAgg.state(all.where(col("batch") <= cut), Seq("k"), col("v")),
          IncrementalAgg.state(all.where(col("batch") > cut), Seq("k"), col("v")),
          Seq("k")),
        Seq("k"))
      assert(got(merged) === direct, s"cut=$cut")
    }
  }

  test("finalize: exact values, n=1 and zero-variance get null/0 sd") {
    val d = got(IncrementalAgg.finalize(
      IncrementalAgg.state(rows(), Seq("k"), col("v")), Seq("k")))
    // a: 1,3,5,7 -> mean 4, sample sd sqrt(20/3)=2.582
    assert(d("a") === ((4L, Some(4.0), Some(2.582), Some(1.0), Some(7.0))))
    assert(d("solo") === ((1L, Some(42.0), None, Some(42.0), Some(42.0))))
    assert(d("flat") === ((3L, Some(2.0), Some(0.0), Some(2.0), Some(2.0))))
    // nulls contribute to NO component
    assert(d("holes") === ((1L, Some(10.0), None, Some(10.0), Some(10.0))))
  }

  test("trend: hand-computed slope/intercept, split-merge invariance, " +
    "degenerate keys null out") {
    // k: y = 2x + 1 exactly; flat: zero x-variance; solo: n = 1
    val df = Seq(
      ("k", 0L, 0.0, 1.0), ("k", 1L, 1.0, 3.0),
      ("k", 2L, 2.0, 5.0), ("k", 3L, 3.0, 7.0),
      ("noisy", 0L, 0.0, 0.0), ("noisy", 1L, 1.0, 0.0),
      ("noisy", 2L, 2.0, 3.0),
      ("flat", 0L, 5.0, 1.0), ("flat", 1L, 5.0, 9.0),
      ("solo", 0L, 1.0, 1.0)).toDF("k", "id", "x", "y")
    def fin(st: DataFrame) = IncrementalAgg.trendFinalize(st, Seq("k"))
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val direct = fin(IncrementalAgg.trendState(df, Seq("k"), col("x"), col("y")))
    assert(direct("k") == ((4L, Some(2.0), Some(1.0))))
    assert(direct("noisy") == ((3L, Some(1.5), Some(-0.5))))
    assert(direct("flat") == ((2L, None, None)))  // det = 0
    assert(direct("solo") == ((1L, None, None)))  // n < 2
    val merged = fin(IncrementalAgg.trendMerge(
      IncrementalAgg.trendState(df.where(col("id") % 2 === 0), Seq("k"),
        col("x"), col("y")),
      IncrementalAgg.trendState(df.where(col("id") % 2 =!= 0), Seq("k"),
        col("x"), col("y")), Seq("k")))
    assert(merged === direct)
  }

  test("trend: a null in either coordinate drops the whole point") {
    val df = Seq(("k", Some(0.0), Some(0.0)), ("k", Some(1.0), Some(2.0)),
      ("k", None, Some(9.0)), ("k", Some(9.0), None))
      .toDF("k", "x", "y")
    val got = IncrementalAgg.trendFinalize(
      IncrementalAgg.trendState(df, Seq("k"), col("x"), col("y")), Seq("k"))
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(got == (("k", 2L, Some(2.0), Some(0.0))))
  }

  import graft.operators.HistogramSketch

  test("histogram sketch: hand-computed interpolated quantiles") {
    // [0,10) in 10 unit bins; values 1..10 (10 clamps into bin 9)
    val df = (1 to 10).map(v => ("k", v.toDouble)).toDF("k", "v")
    val st = HistogramSketch.state(df, Seq("k"), col("v"), 0.0, 10.0, 10)
    val q = HistogramSketch.quantiles(st, Seq("k"), 0.0, 10.0, 10,
        Seq(0.5, 1.0))
      .as[(String, Double, Double)].collect().head
    // p50: pos=5, covering bin 5 (cum 4->5), est = 5 + 1*(1/1) = 6.0
    assert(q == (("k", 6.0, 10.0)))  // p100 = top of the clamped edge bin
  }

  test("histogram sketch: split-merge invariance on seeded random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      (s"k${i % 3}", i.toLong, rnd.nextDouble() * 120 - 10)) // some out-of-domain
      .toDF("k", "id", "v")
    def st(df: DataFrame) =
      HistogramSketch.state(df, Seq("k"), col("v"), 0.0, 100.0, 25)
    val direct = HistogramSketch.quantiles(st(rows), Seq("k"),
        0.0, 100.0, 25, Seq(0.5, 0.9, 0.99))
      .as[(String, Double, Double, Double)].collect().toSet
    val merged = HistogramSketch.quantiles(
        HistogramSketch.merge(st(rows.where(col("id") % 2 === 0)),
          st(rows.where(col("id") % 2 =!= 0)), Seq("k")),
        Seq("k"), 0.0, 100.0, 25, Seq(0.5, 0.9, 0.99))
      .as[(String, Double, Double, Double)].collect().toSet
    assert(merged === direct)
  }

  test("histogram sketch: out-of-domain values clamp, estimates stay in " +
    "the domain; nulls contribute nothing") {
    val df = Seq(("k", Some(-50.0)), ("k", Some(1.0)), ("k", Some(999.0)),
      ("k", None)).toDF("k", "v")
    val st = HistogramSketch.state(df, Seq("k"), col("v"), 0.0, 10.0, 10)
    // 3 non-null rows -> bins 0 (clamped), 0? no: -50->0, 1.0->1, 999->9
    val bins = st.as[(String, Long, Long)].collect().toSet
    assert(bins === Set(("k", 0L, 1L), ("k", 1L, 1L), ("k", 9L, 1L)))
    val q = HistogramSketch.quantiles(st, Seq("k"), 0.0, 10.0, 10, Seq(1.0))
      .as[(String, Double)].collect().head
    assert(q._2 == 10.0) // saturates at the domain top, not at 999
  }
}
