package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.EventWindows
import graft.streaming.{Frontier, StreamHeavyHitters, TwsSessions}
import graft.streaming.StreamHeavyHitters.{hitsOf, seedsFromEmissions, Hit, MgSeed}
import graft.streaming.TwsSessions.{Session, SessionSeed}

/** Warm-start export/import beyond the leaderboard (whose state IS its
  * emissions): the sessionizer seeds open buffers from a batch-history
  * derivation ([[TwsSessions.exportSeeds]] — the batch→streaming handoff),
  * and Misra–Gries seeds counters + (n, dec) from its own emissions table
  * ([[StreamHeavyHitters.seedsFromEmissions]] — made COMPLETE by the
  * tombstone row). Each case locks a seeded successor against a query
  * that saw the whole history. The leaderboard's own warm start is in
  * StreamDecaySpec; checkpoint-restart (same query resuming) is in
  * RecoverySpec. */
class WarmStartSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionizer batch→streaming handoff: batch-closed sessions at " +
    "watermark W + a successor warm-started from exportSeeds(history, W) " +
    "emit exactly the whole-history session set — including a session " +
    "SPANNING the handoff (seed merges with a stream arrival) and a seeded " +
    "key never touched again (closed by the timer armed at seeding)") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      val gapSeconds = 10
      // history: k1 has one closed session and one still-open one at W;
      // k2 closed; k3 open and never touched again; W = 00:01:00
      val history = Seq(
        ("k1", ts("2024-01-01 00:00:00")),
        ("k1", ts("2024-01-01 00:00:05")),   // k1 session [00:00, 00:15]
        ("k2", ts("2024-01-01 00:00:30")),   // k2 session [00:30, 00:40]
        ("k1", ts("2024-01-01 00:01:00")),   // open at W (ends 00:01:10)
        ("k3", ts("2024-01-01 00:02:00")))   // open at W (ends 00:02:10)
      val wMs = ts("2024-01-01 00:01:00").getTime
      // stream era: k1's arrival is 5 s after its open seed — INSIDE the
      // gap, so the seeded times and the new event are ONE session; k4 is
      // brand new; zz only drives the watermark
      val streamBatches = Seq(
        Seq(("k1", ts("2024-01-01 00:01:05")),
            ("k4", ts("2024-01-01 00:03:00"))),
        Seq(("zz", ts("2024-01-01 01:00:00"))),
        Seq(("zz", ts("2024-01-01 01:00:01"))))
      val allEvents = history ++ streamBatches.flatten

      def batchSessions(rows: Seq[(String, Timestamp)]): Set[Session] =
        EventWindows.session(rows.toDF("key", "ts"), col("ts"), "10 seconds",
            keys = Seq(col("key")), aggs = Seq(count(lit(1)).as("n")))
          .select(col("key"), col("session_start"), col("session_end"),
            col("n").as("n_events"))
          .as[Session].collect().toSet

      // the predecessor's output: complete-history sessions closed at W
      val predecessor = batchSessions(history)
        .filter(_.session_end.getTime <= wMs)
      assert(predecessor.map(_.key) === Set("k1", "k2"))

      // the export: open buffers as of W
      val seeds = TwsSessions.exportSeeds(history.toDF("key", "ts"),
        "key", "ts", gapSeconds, wMs)
      val seedMap = seeds.collect().map(s => s.key -> s.event_times).toMap
      assert(seedMap === Map(
        "k1" -> Seq(ts("2024-01-01 00:01:00").getTime),
        "k3" -> Seq(ts("2024-01-01 00:02:00").getTime)),
        s"only the open tails are exported, got $seedMap")

      // the successor: warm-started, sees only the stream era
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Timestamp)]
      val q = TwsSessions.sessionsWarm(
          in.toDF().toDF("key", "ts").withWatermark("ts", "1 second"),
          "key", "ts", gapSeconds, seeds)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("warm_sess").start()
      streamBatches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val successor = spark.table("warm_sess").as[Session].collect().toSet

      // handoff invariant: predecessor ∪ successor = whole-history sessions
      // (zz's own tail session never closes — excluded from the control)
      val control = batchSessions(allEvents).filter(_.key != "zz")
      assert(predecessor.intersect(successor).isEmpty,
        "no session may be emitted on both sides of the handoff")
      assert(predecessor ++ successor === control,
        s"predecessor $predecessor + successor $successor != $control")
      // the two named mechanisms, explicitly
      assert(successor.contains(Session("k1", ts("2024-01-01 00:01:00"),
        ts("2024-01-01 00:01:15"), 2L)),
        "the seeded open buffer must MERGE with the in-gap stream arrival")
      assert(successor.contains(Session("k3", ts("2024-01-01 00:02:00"),
        ts("2024-01-01 00:02:10"), 1L)),
        "a seeded key with no stream-era rows must close from its seeded timer")
    }
  }

  test("Misra–Gries warm start from the emissions table: a successor " +
    "seeded by seedsFromEmissions emits BITWISE the stream-era emissions " +
    "of a whole-history query — including a key whose ONLY export row is " +
    "the tombstone (counters empty, but (n, dec) carried, so the " +
    "absent-item bound stays certified)") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      val capacity = 2
      // key a: a plain summary {p:2, q:1}; key c: its FIRST batch churns
      // to empty (z0 → {z0}, z1 → {z0,z1}, z2 → dec → {}), so its entire
      // export is the tombstone row carrying (n=3, dec=1)
      val b1 = Seq(("a", "p"), ("a", "p"), ("a", "q"),
        ("c", "z0"), ("c", "z1"), ("c", "z2"))
      val b2 = Seq(("a", "p"), ("c", "w"), ("c", "w"))
      val b3 = Seq(("a", "r"), ("c", "w"))

      def runQuery(name: String, batches: Seq[Seq[(String, String)]],
                   seeds: Option[Seq[MgSeed]]): Seq[Hit] = {
        implicit val sqlCtx = spark.sqlContext
        val in = MemoryStream[(String, String)]
        val src = in.toDF().toDF("key", "item")
        val ds = seeds match {
          case None => StreamHeavyHitters.heavyHitters(
            src, "key", "item", capacity)
          case Some(s) => StreamHeavyHitters.heavyHittersWarm(
            src, "key", "item", capacity, s.toDS())
        }
        val q = ds.writeStream.outputMode(OutputMode.Update)
          .format("memory").queryName(name).start()
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        val hits = spark.table(name).as[Hit].collect().toSeq
        q.stop()
        hits
      }

      // control: one query over all three batches
      val ctlAll = runQuery("mgw_ctl", Seq(b1, b2, b3), None)
      val ctlB1 = ctlAll.filter(_.n_seen <= 3)      // per-key b1 era
      val ctlStream = ctlAll.toSet -- ctlB1

      // predecessor sees b1; its emissions are the export
      val exported = runQuery("mgw_pred", Seq(b1), None)
      assert(exported.toSet === ctlB1.toSet)
      val seeds = seedsFromEmissions(exported.toDS()).collect().toSeq
      assert(seeds.toSet === Set(
        MgSeed("a", Map("p" -> 2L, "q" -> 1L), 3L, 0L),
        MgSeed("c", Map.empty, 3L, 1L)),
        s"the tombstone-only key must still export (n, dec), got $seeds")

      // successor: warm-started, sees only b2, b3
      val successor = runQuery("mgw_succ", Seq(b2, b3), Some(seeds))
      assert(successor.toSet === ctlStream,
        s"warm emissions must be bitwise the control's stream era: " +
          s"$successor vs $ctlStream")
      // the restored dec keeps the interval honest: in b2, c's summary is
      // {w:2} with dec=1 → [2,3] brackets true 2; a cold-started c would
      // claim [2,2] AND certify absent z0 ≤ 0, both wrong vs full history
      assert(successor.contains(Hit("c", "w", 2L, 3L, 5L)))
    }
  }

  test("MG warm-start guards: a seed wider than the query's capacity " +
    "fails loudly instead of silently truncating") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val wide = Seq(MgSeed("k",
        Map("a" -> 3L, "b" -> 2L, "c" -> 1L), 6L, 0L))
      val in = MemoryStream[(String, String)]
      val q = StreamHeavyHitters.heavyHittersWarm(
          in.toDF().toDF("key", "item"), "key", "item",
          capacity = 2, wide.toDS())
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("mgw_guard").start()
      val ex = intercept[Exception] {
        in.addData(("k", "a")); q.processAllAvailable()
      }
      q.stop()
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("capacity")),
        s"expected the capacity contract error, got $ex")
    }
  }
}
