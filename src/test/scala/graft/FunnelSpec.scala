package graft

import org.apache.spark.sql.functions._

import graft.ext.FunnelOps

/** Funnel / retention / transition semantics on hand-crafted event logs. */
class FunnelSpec extends SparkTestBase {

  import spark.implicits._

  test("funnel: strictly-increasing chain; pre-step events don't count") {
    val e = Seq(
      // user 1: click@5 precedes signup -> ignored; purchase@15 precedes
      // the qualifying click@20 -> ignored; full depth via 10 -> 20 -> 30
      (1L, 5L, "click"), (1L, 10L, "signup"), (1L, 15L, "purchase"),
      (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: signup only
      (2L, 10L, "signup"),
      // user 3: never signs up -> absent from the funnel
      (3L, 5L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val got = FunnelOps.funnel(e, $"user_id", $"ts_us", $"event_type",
        Seq("signup", "click", "purchase"))
      .select($"k", $"t1", $"t2", $"t3", $"depth")
      .as[(Long, Long, Option[Long], Option[Long], Long)].collect().toSet
    assert(got === Set(
      (1L, 10L, Some(20L), Some(30L), 3L),
      (2L, 10L, None, None, 1L)))
  }

  test("retention: epoch-week cohorts with per-cell distinct keys") {
    val wk = 7L * 86400 * 1000000
    val e = Seq(
      (1L, 0L * wk + 5), (1L, 1L * wk + 5), (1L, 1L * wk + 9), // dup week
      (1L, 3L * wk + 5),
      (2L, 1L * wk + 5), (2L, 2L * wk + 5),
      // pre-epoch: floor division puts ts=-1 in week -1, not week 0
      (3L, -1L), (3L, 5L))
      .toDF("user_id", "ts_us")
    val got = FunnelOps.retention(e, $"user_id", $"ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("transitions: per-key lead pairs, row-normalised probabilities") {
    val e = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (2L, 4L, 10L, "a"), (2L, 5L, 20L, "b"),
      // key 2 then diverges: a -> c once, so P(a->b)=2/3, P(a->c)=1/3
      (2L, 6L, 30L, "a"), (2L, 7L, 40L, "c"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val got = FunnelOps.transitions(e, $"user_id", $"ts_us", $"event_id",
        $"event_type")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", "b", 2L, 0.6667), ("a", "c", 1L, 0.3333),
      ("b", "a", 2L, 1.0)))
  }
}
