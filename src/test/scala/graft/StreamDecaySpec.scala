package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.EventWindows
import graft.streaming.DecayedLeaderboard
import graft.streaming.DecayedLeaderboard.{KeyScore, ScoredEvent}

/** Streaming decayed leaderboard: micro-batch folding equals the batch
  * [[EventWindows.decayedScore]] over the full history at the same ref,
  * including out-of-order (late) events. Fixture times/weights are powers
  * of two so float arithmetic is exact and equality is bitwise. */
class StreamDecaySpec extends SparkTestBase {
  import spark.implicits._

  private val hl = 1000000L // 1 s half-life in micros

  private def lastScores(batches: Seq[Seq[ScoredEvent]],
                         tws: Boolean = false): Map[String, KeyScore] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ScoredEvent]
    val ds = if (tws) DecayedLeaderboard.runTws(in.toDS(), hl)
      else DecayedLeaderboard.run(in.toDS(), hl)
    val name = if (tws) "decay_out_tws" else "decay_out"
    val q = ds.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    // the LAST emitted row per key is the final state
    spark.table(name).as[KeyScore].collect()
      .zipWithIndex.groupBy(_._1.key)
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
  }

  test("micro-batch folding equals the batch aggregate at the same ref, " +
    "late events included") {
    val batches = Seq(
      Seq(ScoredEvent("k", 1000000L, 8.0), ScoredEvent("k", 2000000L, 4.0)),
      Seq(ScoredEvent("k", 4000000L, 2.0),
        ScoredEvent("k", 3000000L, 2.0),   // in-batch out of order
        ScoredEvent("q", 4000000L, 16.0)),
      Seq(ScoredEvent("k", 2000000L, 8.0))) // LATE: older than the ref
    val got = lastScores(batches)
    assert(got("k").refMicros == 4000000L && got("q").refMicros == 4000000L)
    // batch reference: all k events decayed to ref=4s
    // 8*2^-3 + 4*2^-2 + 2*2^0 + 2*2^-1 + 8*2^-2 = 1+1+2+1+2 = 7
    assert(got("k").score == 7.0)
    assert(got("q").score == 16.0)
    // cross-check against the batch operator over the union
    val all = batches.flatten.filter(_.key == "k")
      .map(e => ("k", e.tsMicros, e.weight)).toDF("key", "tu", "v")
    val batch = EventWindows.decayedScore(all, Seq($"key"), $"tu", $"v",
      refMicros = 4000000L, halfLifeMicros = hl)
      .as[(String, Double, Long)].collect().head
    assert(batch._2 == got("k").score && batch._3 == 5L)
  }

  test("transformWithState form: emitted scores bitwise-equal the " +
    "mapGroupsWithState form's across the same batches (shared fold, two " +
    "operator APIs), including the late-event case") {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> graft.streaming.Frontier.RocksDbProvider) {
      val batches = Seq(
        Seq(ScoredEvent("k", 1000000L, 8.0), ScoredEvent("k", 2000000L, 4.0)),
        Seq(ScoredEvent("k", 4000000L, 2.0),
          ScoredEvent("k", 3000000L, 2.0),
          ScoredEvent("q", 4000000L, 16.0)),
        Seq(ScoredEvent("k", 2000000L, 8.0))) // LATE: older than the ref
      val got = lastScores(batches, tws = true)
      assert(got === lastScores(batches)) // fMGWS form, same batches
      assert(got("k").score == 7.0 && got("k").refMicros == 4000000L)
      assert(got("q").score == 16.0)
    }
  }

  test("warm start from an exported leaderboard: a successor query seeded " +
    "with the predecessor's latest emissions produces BITWISE the " +
    "emissions of a query that saw the whole history; an exported-only " +
    "key re-ages from its seed on first touch") {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> graft.streaming.Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val history = Seq(ScoredEvent("k", 1000000L, 4.0),
        ScoredEvent("k", 1000000L, 2.0),
        ScoredEvent("idle", 1000000L, 8.0))
      val s1 = Seq(ScoredEvent("k", 2000000L, 1.0))
      // idle touched two half-lives after its exported ref; fresh is new
      val s2 = Seq(ScoredEvent("idle", 3000000L, 1.0),
        ScoredEvent("fresh", 3000000L, 2.0))

      // control: ONE query sees history + stream; keep the stream-era
      // emissions separately from the history batch's
      val inA = MemoryStream[ScoredEvent]
      val qA = DecayedLeaderboard.runTws(inA.toDS(), hl)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("warm_ctl").start()
      inA.addData(history); qA.processAllAvailable()
      val exported = spark.table("warm_ctl").as[KeyScore].collect().toSet
      Seq(s1, s2).foreach { b => inA.addData(b); qA.processAllAvailable() }
      qA.stop()
      val streamEraCtl =
        spark.table("warm_ctl").as[KeyScore].collect().toSet -- exported

      // successor: a FRESH query warm-started from the export (the emitted
      // KeyScore IS the state), seeing only the stream era
      val inB = MemoryStream[ScoredEvent]
      val qB = DecayedLeaderboard.runTwsWarm(inB.toDS(), hl,
          exported.toSeq.toDS())
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("warm_succ").start()
      Seq(s1, s2).foreach { b => inB.addData(b); qB.processAllAvailable() }
      qB.stop()
      val got = spark.table("warm_succ").as[KeyScore].collect().toSet

      assert(got === streamEraCtl,
        "warm-started emissions must be bitwise the full-history query's")
      // the seeded arithmetic, explicitly: k = 6 aged 1s->2s (3) + 1;
      // idle = 8 aged two half-lives (2) + 1; fresh = plain 2
      assert(got === Set(KeyScore("k", 4.0, 2000000L),
        KeyScore("idle", 3.0, 3000000L), KeyScore("fresh", 2.0, 3000000L)))
    }
  }

  test("a key untouched by a batch keeps its state and re-ages correctly " +
    "when it reappears") {
    val batches = Seq(
      Seq(ScoredEvent("k", 1000000L, 4.0)),
      Seq(ScoredEvent("other", 5000000L, 1.0)),      // k untouched
      Seq(ScoredEvent("k", 3000000L, 1.0)))           // k reappears 2 hl later
    val got = lastScores(batches)
    // 4 aged two half-lives (1 -> 3) = 1, plus the new 1
    assert(got("k").score == 2.0 && got("k").refMicros == 3000000L)
  }
}
