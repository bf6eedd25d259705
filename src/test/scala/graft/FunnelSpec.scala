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

  test("coVisitation: pair counts + cosine match hand computation; " +
    "repeat events collapse; single-item keys contribute nothing") {
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"),   // u1 {a,b} (repeat b collapses)
      (2L, "a"), (2L, "b"), (2L, "c"),   // u2 {a,b,c}
      (3L, "a"),                         // singleton: no pairs
      (4L, "c")).toDF("user_id", "item")
    val got = FunnelOps.coVisitation(ev, $"user_id", $"item")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // marginals: a=3, b=2, c=2; pairs: (a,b)=2, (a,c)=1, (b,c)=1
    assert(got(("a", "b")) == ((2L, 0.8165)))  // 2/sqrt(6)
    assert(got(("a", "c")) == ((1L, 0.4082)))  // 1/sqrt(6)
    assert(got(("b", "c")) == ((1L, 0.5)))     // 1/sqrt(4)
    assert(got.size == 3)
  }

  test("coVisitation: power key past maxItemsPerKey raises loudly") {
    val ev = (0 until 5).map(i => (1L, s"i$i")).toDF("user_id", "item")
    val ex = intercept[Exception] {
      FunnelOps.coVisitation(ev, $"user_id", $"item",
        maxItemsPerKey = 4).collect()
    }
    assert(ex.getMessage.contains("maxItemsPerKey"))
  }

  test("decayedScore: half-life arithmetic and split-merge invariance") {
    import graft.ext.EventWindows
    val hl = 1000000L // 1s half-life, micros
    val ref = 10000000L
    val ev = Seq(
      ("k", 10000000L, 8.0),  // age 0  -> weight 1
      ("k", 9000000L, 4.0),   // age 1s -> 1/2
      ("k", 8000000L, 4.0),   // age 2s -> 1/4
      ("q", 6000000L, 16.0))  // age 4s -> 1/16
      .toDF("key", "tu", "v")
    val got = EventWindows.decayedScore(ev, Seq($"key"), $"tu", $"v", ref, hl)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("k") == ((8.0 + 2.0 + 1.0, 3L)))
    assert(got("q") == ((1.0, 1L)))
    // mergeability: score over the union == sum of per-split scores at the
    // same ref — the property that makes the aggregate incremental
    def scoreOf(df: org.apache.spark.sql.DataFrame) =
      EventWindows.decayedScore(df, Seq($"key"), $"tu", $"v", ref, hl)
        .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    val s1 = scoreOf(ev.where($"tu" >= 9000000L))
    val s2 = scoreOf(ev.where($"tu" < 9000000L))
    assert(s1.getOrElse("k", 0.0) + s2.getOrElse("k", 0.0) == got("k")._1)
  }

  test("decayedScore: aging the ref by one half-life halves the score") {
    import graft.ext.EventWindows
    val hl = 1000000L
    val ev = Seq(("k", 1000000L, 6.0), ("k", 2000000L, 10.0))
      .toDF("key", "tu", "v")
    def at(ref: Long) = EventWindows.decayedScore(ev, Seq($"key"),
      $"tu", $"v", ref, hl).as[(String, Double, Long)].collect().head._2
    assert(math.abs(at(4000000L) - at(3000000L) / 2) < 1e-9)
  }
}
