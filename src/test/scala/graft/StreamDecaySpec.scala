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
