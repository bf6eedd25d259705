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
}
