package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CrawlBudget

/** Per-host crawl-budget admission: in-order cut at maxPerWindow, window
  * reset, cross-batch budget persistence, lapsed-window denial, and
  * timeout eviction (fresh budget after the watermark passes). */
class CrawlBudgetSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def run(batches: Seq[Seq[(Long, String, Timestamp)]], name: String)
      : Map[String, (Boolean, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = CrawlBudget.perHostAdmit(
        in.toDF().toDF("fetch_id", "url", "ts"), "url", "ts",
        watermark = "10 minutes", windowSeconds = 60, maxPerWindow = 3)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select("url", "admitted", "n_in_window")
      .as[(String, Boolean, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("in-order admission cut at maxPerWindow; other hosts unaffected; " +
    "a later window resets the budget") {
    def u(h: String, p: Int) = s"https://$h.example.com/p/$p"
    val got = run(Seq(Seq(
      // host a: five fetches in one minute-window, budget 3 — the three
      // EARLIEST (ts, url) admit, deterministically
      (1L, u("a", 1), ts("2024-01-01 00:00:01")),
      (2L, u("a", 2), ts("2024-01-01 00:00:02")),
      (3L, u("a", 3), ts("2024-01-01 00:00:03")),
      (4L, u("a", 4), ts("2024-01-01 00:00:04")),
      (5L, u("a", 5), ts("2024-01-01 00:00:05")),
      // host b shares the window but has its own budget
      (6L, u("b", 1), ts("2024-01-01 00:00:10")),
      // host a, NEXT minute window: budget is fresh
      (7L, u("a", 9), ts("2024-01-01 00:01:30")))), "cb1")
    assert(got(u("a", 1)) === ((true, 1)))
    assert(got(u("a", 2)) === ((true, 2)))
    assert(got(u("a", 3)) === ((true, 3)))
    assert(got(u("a", 4)) === ((false, 3)))
    assert(got(u("a", 5)) === ((false, 3)))
    assert(got(u("b", 1)) === ((true, 1)))
    assert(got(u("a", 9)) === ((true, 1)))
  }

  test("budget persists ACROSS batches within a window; a late fetch from " +
    "a lapsed window is denied with n_in_window = -1") {
    def u(p: Int) = s"https://h.example.com/p/$p"
    val got = run(Seq(
      Seq((1L, u(1), ts("2024-01-01 00:05:01")),
        (2L, u(2), ts("2024-01-01 00:05:02"))),
      // same window, next micro-batch: only ONE admission left
      Seq((3L, u(3), ts("2024-01-01 00:05:10")),
        (4L, u(4), ts("2024-01-01 00:05:11")),
        // and a straggler from an older window (inside the watermark):
        // its window's budget has lapsed — denied, flagged -1
        (5L, u(9), ts("2024-01-01 00:04:30")))), "cb2")
    assert(got(u(1)) === ((true, 1)))
    assert(got(u(2)) === ((true, 2)))
    assert(got(u(3)) === ((true, 3)))
    assert(got(u(4)) === ((false, 3)))
    assert(got(u(9)) === ((false, -1)))
  }

  test("bounded buffering: a single-host flood keeps at most " +
    "windows*maxPerWindow rows buffered, output and final state exactly " +
    "match the unbounded sorted replay") {
    import graft.streaming.CrawlBudget.{BudgetState, DocAdmission}
    val winMs = 60000L
    val max = 3
    val base = ts("2024-01-01 00:00:00").getTime
    // 30k fetches over 4 windows, deterministically shuffled so arrival
    // order is adversarial w.r.t. (ts, url) order; each carries a payload
    // that must ride through untouched
    val flood = (0 until 30000).map { i =>
      val w = i % 4
      val t = new Timestamp(base + w * winMs + (i % 57) * 1000L)
      val u = s"https://h.example.com/p/${(i * 7919) % 30000}"
      (s"h.example.com", u, t, s"body-of-$u")
    }.sortBy { case (_, u, _, _) => u.hashCode * 31 + u.length } // scrambled
    // independent oracle: the pre-bounded algorithm (full buffer + sort)
    def naive(st0: Option[BudgetState]): (Seq[DocAdmission], BudgetState) = {
      val sorted = flood.sortBy(r => (r._3.getTime, r._2))
      var st = st0.getOrElse(BudgetState(Long.MinValue, 0))
      val out = sorted.map { case (h, url, t, pay) =>
        val w = Math.floorDiv(t.getTime, winMs) * winMs
        if (w > st.windowStart) st = BudgetState(w, 0)
        if (w < st.windowStart) DocAdmission(h, url, t, false, -1, pay)
        else if (st.admitted < max) {
          st = st.copy(admitted = st.admitted + 1)
          DocAdmission(h, url, t, true, st.admitted, pay)
        } else DocAdmission(h, url, t, false, st.admitted, pay)
      }
      (out, st)
    }
    // carried state: the first window already half-spent, and one
    // EARLIER window lapsed relative to it is exercised via w0 > min w
    val st0 = Some(BudgetState(base + winMs, 2))
    var maxBuffered = 0
    var committed: BudgetState = null
    val got = graft.streaming.CrawlBudget.admitGroup(
      "h.example.com", flood.iterator, st0, winMs, max,
      commit = committed = _, bufferProbe = n => maxBuffered = maxBuffered max n)
      .toSeq
    val (want, wantSt) = naive(st0)
    assert(maxBuffered <= 4 * max,
      s"buffered $maxBuffered rows; bound is windows*maxPerWindow = ${4 * max}")
    assert(committed === wantSt)
    assert(got.size === want.size)
    // multiset equality (overflow denials interleave ahead of the replay)
    assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
      want.groupBy(identity).view.mapValues(_.size).toMap)
    // lapsed-window flag present: window 0 predates the carried window
    assert(got.count(_.n_in_window == -1) === want.count(_.n_in_window == -1))
    assert(got.count(_.n_in_window == -1) > 0)
    // payloads rode through untouched on every row
    assert(got.forall(d => d.payload === s"body-of-${d.url}"))
  }

  test("payload attribution is deterministic when two rows collide on " +
    "(ts, url): the payload-smaller row is kept (null first), whatever " +
    "the arrival order") {
    import graft.streaming.CrawlBudget.BudgetState
    val winMs = 60000L
    val t0 = ts("2024-01-01 00:00:00")
    val u = "https://h.example.com/p/1"
    // same (ts, url) three ways: null payload, "a", "b"; budget 1 admits
    // exactly one — the (ts, url, null-first, payload) total order says
    // it must be the null one, and "b" and "a" are denials, in any
    // arrival permutation
    val rows = Seq(("h.example.com", u, t0, null: String),
      ("h.example.com", u, t0, "b"), ("h.example.com", u, t0, "a"))
    rows.permutations.foreach { perm =>
      var committed: BudgetState = null
      val got = graft.streaming.CrawlBudget.admitGroup(
        "h.example.com", perm.iterator, None, winMs, maxPerWindow = 1,
        commit = committed = _).toSeq
      assert(got.count(_.admitted) === 1)
      assert(got.find(_.admitted).get.payload === null,
        s"arrival order $perm must keep the null-payload row")
      assert(got.filterNot(_.admitted).map(_.payload).toSet === Set("a", "b"))
      assert(committed === BudgetState(Math.floorDiv(t0.getTime, winMs) * winMs, 1))
    }
  }

  test("end-to-end flood: one host, one window, 2000 fetches in one " +
    "micro-batch -> exactly maxPerWindow admitted, the rest denied at the " +
    "budget") {
    val flood = (0 until 2000).map { i =>
      (i.toLong, s"https://flood.example.com/p/$i",
        ts("2024-01-01 00:00:01"))
    }
    val got = run(Seq(flood), "cb_flood")
    val admitted = got.collect { case (u, (true, n)) => (u, n) }
    assert(admitted.size === 3)
    // deterministic cut: lexicographically smallest urls at equal ts
    assert(admitted.map(_._1).toSet ===
      flood.map(_._2).sorted.take(3).toSet)
    assert(got.collect { case (_, (false, n)) => n }.toSeq.distinct === Seq(3))
    assert(got.size === 2000)
  }

  test("timeout eviction: once the watermark passes the window end, the " +
    "host's state is removed and a new fetch gets a fresh budget") {
    def u(p: Int) = s"https://h.example.com/p/$p"
    val got = run(Seq(
      // exhaust the 00:00 window's budget
      Seq((1L, u(1), ts("2024-01-01 00:00:01")),
        (2L, u(2), ts("2024-01-01 00:00:02")),
        (3L, u(3), ts("2024-01-01 00:00:03")),
        (4L, u(4), ts("2024-01-01 00:00:04"))),
      // advance the watermark far past the window (10 min watermark)
      Seq((5L, s"https://other.example.com/adv", ts("2024-01-01 01:00:00"))),
      // h re-appears in a much later window — fresh state, fresh budget
      Seq((6L, u(5), ts("2024-01-01 00:59:00")))), "cb3")
    assert(got(u(4)) === ((false, 3)))
    assert(got(u(5)) === ((true, 1)))
  }
}
