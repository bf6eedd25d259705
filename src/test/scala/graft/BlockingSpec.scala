package graft

import org.apache.spark.sql.functions._

import graft.operators.Blocking

/** Sorted-neighborhood blocking: hand-ordered pairs, window semantics,
  * stratum isolation, and the linear candidate bound under skew. */
class BlockingSpec extends SparkTestBase {

  import spark.implicits._

  private val df = Seq(
    (1L, "a", 10), (2L, "a", 12), (3L, "a", 11), (4L, "a", 40),
    (5L, "b", 10), (6L, "b", 11)).toDF("id", "blk", "len")

  private def pairs(window: Int) =
    Blocking.sortedNeighborhood(df, $"id", $"blk", $"len", window)
      .as[(Long, Long)].collect().toSet

  test("window 2 pairs each record with its sort successor only") {
    // a sorted by len: 1(10) 3(11) 2(12) 4(40); b: 5(10) 6(11)
    assert(pairs(2) === Set((1L, 3L), (3L, 2L), (2L, 4L), (5L, 6L)))
  }

  test("window 3 adds the rank+2 neighbours; strata never mix") {
    val p = pairs(3)
    assert(p === Set((1L, 3L), (3L, 2L), (2L, 4L), (1L, 2L), (3L, 4L),
      (5L, 6L)))
    assert(p.forall { case (a, b) => !(a <= 4) || b <= 4 }) // no a↔b leak
  }

  test("candidates stay linear under total skew (every key identical)") {
    val skew = Seq.tabulate(100)(i => (i.toLong, "x", 7))
      .toDF("id", "blk", "len")
    val n = Blocking.sortedNeighborhood(skew, $"id", $"blk", $"len", 4)
      .count()
    // (w-1)*n - sum over the last w-1 ranks = 3*100 - (3+2+1)
    assert(n === 294L)
  }

  test("null block or sort key rows are excluded") {
    val withNulls = Seq((1L, Some("a"), Some(1)), (2L, None, Some(2)),
      (3L, Some("a"), None), (4L, Some("a"), Some(3)))
      .toDF("id", "blk", "len")
    val got = Blocking.sortedNeighborhood(withNulls, $"id", $"blk", $"len", 2)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L)))
  }
}
