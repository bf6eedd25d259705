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
