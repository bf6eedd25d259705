package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.ScdMerge
import graft.streaming.{CrawlBudget, Frontier}

/** Checkpoint-RESTART recovery — the production property a stateful
  * pipeline is bought for, and the one thing a single-lifecycle spec can
  * never show: every other streaming spec runs one query object start to
  * stop. Each test here runs the same deterministic batches through (A)
  * one uninterrupted query and (B) a query STOPPED mid-stream and
  * restarted from its checkpointLocation (same source, same sink path,
  * data arriving while the query is down), then proves
  *
  *   - output parity: the restarted run's committed output is exactly the
  *     uninterrupted run's — nothing re-emitted, nothing lost (file sink
  *     + its _spark_metadata log, so the read is the exactly-once view);
  *   - state restoration: decisions after the restart depend on state
  *     built BEFORE it (a budget window half-spent pre-stop must deny
  *     post-restart; a chunk seen pre-stop must suppress post-restart),
  *     and per-operator state row counts end equal to the uninterrupted
  *     run's.
  *
  * Covered surfaces: the 3-stage frontier (TWS + two dedup stores on
  * RocksDB — the hardest restore: three state formats in one query), the
  * flatMapGroupsWithState budget alone (HDFS-backed store), and the SCD2
  * foreachBatch merge into a versioned store (batchId continuation — a
  * replayed batch would mint a duplicate version). */
class RecoverySpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def doc(prefix: String): String =
    (1 to 40).map(i => s"$prefix$i").mkString(" ")

  private def chunksOf(text: String): Set[String] =
    graft.ext.TextOps.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 3, divisor = 4, maxLen = 8)
      .select("chunk_md5").as[String].collect().toSet

  /** (operatorName, numRowsTotal) of the query's last progress, sorted —
    * names repeat (two dedupe stores in the frontier), so the comparable
    * form is the sorted multiset. */
  private def stateShape(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Seq[(String, Long)] =
    q.lastProgress.stateOperators.toSeq
      .map(o => o.operatorName -> o.numRowsTotal).sorted

  test("crawlFrontier restart: stop after batch 2 of 4, data arrives while " +
    "down, restart from the checkpoint — output equals the uninterrupted " +
    "run, a half-spent budget window still denies, a pre-stop chunk still " +
    "suppresses, per-stage state counts restored") {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) { frontierRestartParity() }
  }

  test("crawlFrontier restart under RocksDB CHANGELOG checkpointing: the " +
    "restore path is changelog replay over the last snapshot (the " +
    "production low-commit-latency mode), same parity obligations", LongRun) {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        -> "true") { frontierRestartParity() }
  }

  private def frontierRestartParity(): Unit = {
    {
      implicit val sqlCtx = spark.sqlContext
      val docA = doc("a"); val docB = doc("b"); val docC = doc("c")
      val docD = doc("d"); val docE = doc("e"); val docF = doc("f")
      val docG = doc("g"); val docH = doc("h")
      // batch 0, window 00:00 (budget 2/host/min): p1+p2 admit on host a,
      // the p1 re-spelling dies at urlDedup, p3 is DENIED, host b admits p1
      val b0 = Seq(
        ("http://a.example.com/p/1?utm_source=x", docA, ts("2024-01-01 00:00:01")),
        ("HTTP://A.Example.COM:80/p/1", docA, ts("2024-01-01 00:00:02")),
        ("http://a.example.com/p/2", docB, ts("2024-01-01 00:00:03")),
        ("http://a.example.com/p/3", docC, ts("2024-01-01 00:00:04")),
        ("http://b.example.com/p/1", docD, ts("2024-01-01 00:00:05")))
      // batch 1, window 00:01: host a spends its WHOLE budget (2/2) — the
      // window the restart must restore half-way through
      val b1 = Seq(
        ("http://a.example.com/p/4", docE, ts("2024-01-01 00:01:05")),
        ("http://a.example.com/p/5", docF, ts("2024-01-01 00:01:10")))
      // batch 2, SAME window 00:01 — in run B this arrives while the query
      // is down and is processed by the restarted query: the p1 re-spelling
      // must die at the RESTORED url seen-set, p6 must be denied by the
      // RESTORED (windowStart, admitted=2) counters (lost state would admit
      // and emit docG), and host b's fresh re-crawl of docA's content must
      // emit NOTHING against the RESTORED chunk seen-set (lost state would
      // re-emit every docA chunk under b/p/2)
      val b2 = Seq(
        ("HTTP://A.Example.COM/p/1", docA, ts("2024-01-01 00:01:15")),
        ("http://a.example.com/p/6", docG, ts("2024-01-01 00:01:20")),
        ("http://b.example.com/p/2", docA, ts("2024-01-01 00:01:25")))
      // batch 3, window 00:02: the restarted budget must roll to a fresh
      // window and admit again
      val b3 = Seq(
        ("http://a.example.com/p/7", docH, ts("2024-01-01 00:02:10")))

      val tmp = java.nio.file.Files.createTempDirectory("frontier_rec").toString
      def start(in: MemoryStream[(String, String, Timestamp)], tag: String) =
        Frontier.crawlFrontier(
            in.toDF().toDF("url", "text", "ts"), "url", "text", "ts",
            watermark = "1 hour", windowSeconds = 60, maxPerWindow = 2,
            k = 3, divisor = 4, maxLen = 8)
          .writeStream.outputMode(OutputMode.Append)
          .format("parquet").option("path", s"$tmp/out_$tag")
          .option("checkpointLocation", s"$tmp/ckpt_$tag").start()

      // run A: uninterrupted
      val inA = MemoryStream[(String, String, Timestamp)]
      val qA = start(inA, "a")
      Seq(b0, b1, b2, b3).foreach { b => inA.addData(b); qA.processAllAvailable() }
      val shapeA = stateShape(qA)
      qA.stop()

      // run B: stop after b1, b2 arrives while down, restart, then b3
      val inB = MemoryStream[(String, String, Timestamp)]
      val qB1 = start(inB, "b")
      Seq(b0, b1).foreach { b => inB.addData(b); qB1.processAllAvailable() }
      qB1.stop()
      inB.addData(b2) // lands while no query is running
      val qB2 = start(inB, "b") // SAME checkpoint, SAME sink path
      qB2.processAllAvailable() // drains b2 through the recovered state
      inB.addData(b3); qB2.processAllAvailable()
      val shapeB = stateShape(qB2)
      qB2.stop()

      def emitted(tag: String): Map[String, Set[String]] =
        spark.read.parquet(s"$tmp/out_$tag").select("url", "chunk_md5")
          .as[(String, String)].collect().toSeq
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val a = emitted("a"); val b = emitted("b")

      // no re-emission anywhere: (url, chunk) pairs are globally unique in
      // the restarted run's committed output
      val pairsB = spark.read.parquet(s"$tmp/out_b")
        .select("url", "chunk_md5").as[(String, String)].collect().toSeq
      assert(pairsB.size === pairsB.toSet.size,
        "restart must not re-emit any (url, chunk) pair")
      // output parity with the uninterrupted run
      assert(b === a, "restarted output must equal the uninterrupted run's")
      // the restored-state decisions, asserted directly on run B
      val cA = chunksOf(docA); val cH = chunksOf(docH)
      assert(!b.contains("http://a.example.com/p/6"),
        "restored budget counters must deny p6 in the half-spent window")
      assert(b.values.flatten.toSet.intersect(chunksOf(docG)).isEmpty)
      assert(!b.contains("http://b.example.com/p/2"),
        "restored chunk state must suppress the full re-crawl")
      assert(b("http://a.example.com/p/1") === cA) // canonical spelling
      assert(b("http://a.example.com/p/7") === cH,
        "a fresh window after restart must admit and emit")
      // per-stage state counts end identical: 2 live hosts, 9 canonical
      // urls, the union of emitted-document chunk sets
      assert(shapeB === shapeA,
        s"state shapes differ: A=$shapeA B=$shapeB")
      assert(shapeA.map(_._2).sorted ===
        Seq(2L, 9L,
          (cA ++ chunksOf(docB) ++ chunksOf(docD) ++ chunksOf(docE) ++
            chunksOf(docF) ++ cH).size.toLong).sorted)
    }
    ()
  }

  test("decayed-leaderboard TWS restart (TimeMode.None, no watermark): the " +
    "(score, ref) ValueState restores, so post-restart emissions equal the " +
    "uninterrupted run's — including re-aging a key untouched since before " +
    "the stop") {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      import graft.streaming.DecayedLeaderboard
      import graft.streaming.DecayedLeaderboard.{KeyScore, ScoredEvent}
      implicit val sqlCtx = spark.sqlContext
      val hl = 1000000L
      // batch 2 (post-restart) re-touches k two half-lives after its last
      // event AND first-touches q: k's correct score NEEDS the restored
      // (score=6, ref=1s) state — lost state would emit score=1
      val b0 = Seq(ScoredEvent("k", 1000000L, 4.0), ScoredEvent("k", 1000000L, 2.0))
      val b1 = Seq(ScoredEvent("other", 2000000L, 1.0))
      val b2 = Seq(ScoredEvent("k", 3000000L, 1.0), ScoredEvent("q", 3000000L, 8.0))

      val tmp = java.nio.file.Files.createTempDirectory("decay_rec").toString
      // the memory sink does not support checkpoint recovery; foreachBatch
      // does — each query object gets its own sink buffer, so the second
      // object's buffer holds exactly the post-restart emissions
      def start(in: MemoryStream[ScoredEvent], ckpt: String,
                sink: scala.collection.mutable.Set[KeyScore]) =
        DecayedLeaderboard.runTws(in.toDS(), hl)
          .writeStream.outputMode(OutputMode.Update)
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyScore],
                           _: Long) =>
            sink.synchronized { sink ++= batch.collect() }; ()
          }.start()

      // run A: uninterrupted; keep only batch-2's emissions for compare
      val inA = MemoryStream[ScoredEvent]
      val sinkA = scala.collection.mutable.Set.empty[KeyScore]
      val qA = start(inA, s"$tmp/ckpt_a", sinkA)
      Seq(b0, b1).foreach { b => inA.addData(b); qA.processAllAvailable() }
      val preA = sinkA.toSet
      inA.addData(b2); qA.processAllAvailable()
      val lastA = sinkA.toSet -- preA
      qA.stop()

      // run B: stop after b1, b2 arrives while down, restart into a FRESH
      // sink buffer so it holds exactly the post-restart emissions
      val inB = MemoryStream[ScoredEvent]
      val sinkB1 = scala.collection.mutable.Set.empty[KeyScore]
      val qB1 = start(inB, s"$tmp/ckpt_b", sinkB1)
      Seq(b0, b1).foreach { b => inB.addData(b); qB1.processAllAvailable() }
      qB1.stop()
      inB.addData(b2)
      val sinkB2 = scala.collection.mutable.Set.empty[KeyScore]
      val qB2 = start(inB, s"$tmp/ckpt_b", sinkB2)
      qB2.processAllAvailable()
      qB2.stop()
      val lastB = sinkB2.toSet

      assert(lastB === lastA,
        "post-restart emissions must equal the uninterrupted run's")
      // the restored-state arithmetic, explicitly: 6 aged 1s->3s (two
      // half-lives) = 1.5, plus the fresh 1.0
      assert(lastB === Set(KeyScore("k", 2.5, 3000000L),
        KeyScore("q", 8.0, 3000000L)))
    }
  }

  test("perHostAdmit restart (flatMapGroupsWithState, default state store): " +
    "a window half-spent before the stop denies after the restart; output " +
    "parity with the uninterrupted run") {
    implicit val sqlCtx = spark.sqlContext
    // b0 spends host h1's window budget (2) and denies u3; b1 arrives while
    // run B is down: u4 must be denied with n_in_window = 2 straight out of
    // the RESTORED counters, h2 is a fresh host; b2 opens a new window
    val b0 = Seq(
      (1L, "https://h1.example.com/u1", ts("2024-01-01 00:00:01")),
      (2L, "https://h1.example.com/u2", ts("2024-01-01 00:00:02")),
      (3L, "https://h1.example.com/u3", ts("2024-01-01 00:00:03")))
    val b1 = Seq(
      (4L, "https://h1.example.com/u4", ts("2024-01-01 00:00:10")),
      (5L, "https://h2.example.com/u1", ts("2024-01-01 00:00:11")))
    val b2 = Seq(
      (6L, "https://h1.example.com/u5", ts("2024-01-01 00:01:05")))

    val tmp = java.nio.file.Files.createTempDirectory("budget_rec").toString
    def start(in: MemoryStream[(Long, String, Timestamp)], tag: String) =
      CrawlBudget.perHostAdmit(
          in.toDF().toDF("fetch_id", "url", "ts"), "url", "ts",
          watermark = "1 hour", windowSeconds = 60, maxPerWindow = 2)
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", s"$tmp/out_$tag")
        .option("checkpointLocation", s"$tmp/ckpt_$tag").start()

    val inA = MemoryStream[(Long, String, Timestamp)]
    val qA = start(inA, "a")
    Seq(b0, b1, b2).foreach { b => inA.addData(b); qA.processAllAvailable() }
    val shapeA = stateShape(qA)
    qA.stop()

    val inB = MemoryStream[(Long, String, Timestamp)]
    val qB1 = start(inB, "b")
    inB.addData(b0); qB1.processAllAvailable()
    qB1.stop()
    inB.addData(b1)
    val qB2 = start(inB, "b")
    qB2.processAllAvailable()
    inB.addData(b2); qB2.processAllAvailable()
    val shapeB = stateShape(qB2)
    qB2.stop()

    def out(tag: String): Set[(String, Boolean, Int)] =
      spark.read.parquet(s"$tmp/out_$tag")
        .select("url", "admitted", "n_in_window")
        .as[(String, Boolean, Int)].collect().toSet
    val a = out("a"); val b = out("b")
    assert(b === a, "restarted verdicts must equal the uninterrupted run's")
    assert(b.contains(("https://h1.example.com/u4", false, 2)),
      "the restored half-spent window must deny u4 at n_in_window = 2")
    assert(b.contains(("https://h2.example.com/u1", true, 1)))
    assert(b.contains(("https://h1.example.com/u5", true, 1)),
      "a fresh window after restart must admit")
    assert(shapeB === shapeA)
    assert(shapeA.map(_._2).sum === 2L, "state is two live hosts")
  }

  test("heavy-hitters MapState restart: the per-item counters AND the " +
    "(n, dec) ValueStates restore — post-restart increments continue from " +
    "the pre-stop summary, completing the per-state-type recovery matrix") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> graft.streaming.Frontier.RocksDbProvider) {
      import graft.streaming.StreamHeavyHitters
      import graft.streaming.StreamHeavyHitters.Hit
      implicit val sqlCtx = spark.sqlContext
      val b0 = Seq(("h", "big"), ("h", "big"), ("h", "big"), ("h", "x"))
      val b1 = Seq(("h", "big"), ("h", "big")) // arrives while down

      val tmp = java.nio.file.Files.createTempDirectory("mg_rec").toString
      def start(in: MemoryStream[(String, String)], ckpt: String,
                sink: scala.collection.mutable.Set[Hit]) =
        StreamHeavyHitters.heavyHitters(
            in.toDF().toDF("key", "item"), "key", "item", capacity = 4)
          .writeStream.outputMode(OutputMode.Update)
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Hit],
                           _: Long) =>
            sink.synchronized { sink ++= batch.collect() }; ()
          }.start()

      // run A: uninterrupted; keep only the final batch's emissions
      val inA = MemoryStream[(String, String)]
      val sinkA = scala.collection.mutable.Set.empty[Hit]
      val qA = start(inA, s"$tmp/ckpt_a", sinkA)
      inA.addData(b0); qA.processAllAvailable()
      val preA = sinkA.toSet
      inA.addData(b1); qA.processAllAvailable()
      val lastA = sinkA.toSet -- preA
      qA.stop()

      // run B: stop after b0; b1 lands while down; restart into a fresh
      // sink buffer holding exactly the post-restart emissions
      val inB = MemoryStream[(String, String)]
      val sinkB1 = scala.collection.mutable.Set.empty[Hit]
      val qB1 = start(inB, s"$tmp/ckpt_b", sinkB1)
      inB.addData(b0); qB1.processAllAvailable()
      qB1.stop()
      inB.addData(b1)
      val sinkB2 = scala.collection.mutable.Set.empty[Hit]
      val qB2 = start(inB, s"$tmp/ckpt_b", sinkB2)
      qB2.processAllAvailable()
      qB2.stop()

      assert(sinkB2.toSet === lastA,
        "post-restart emissions must equal the uninterrupted run's")
      // the restored arithmetic: big = 3 (restored) + 2, n = 6; x's
      // restored counter re-emits unchanged at the new n
      assert(sinkB2.toSet === Set(Hit("h", "big", 5L, 5L, 6L),
        Hit("h", "x", 1L, 1L, 6L)))
    }
  }

  test("stream-stream join restart: BOTH sides' buffered state restores — " +
    "an impression buffered before the stop matches a click that arrives " +
    "while the query is down; output parity, no re-emitted pairs") {
    implicit val sqlCtx = spark.sqlContext
    // batch 0: two impressions, no clicks — both must be BUFFERED, and that
    // buffer is exactly what the restart has to restore
    val i0 = Seq((1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 2L, ts("2024-01-01 00:00:10")))
    // arrives while run B is down: click 100 falls inside imp 1's window —
    // lost join state would never emit the (1, 100) pair; click 101 is a
    // pre-restart click the post-restart imp 3 must match the OTHER way
    val c1 = Seq((100L, 1L, ts("2024-01-01 00:05:00")),
      (101L, 3L, ts("2024-01-01 00:06:00")))
    // after the restart: imp 3 matches the buffered click 101 (click-side
    // state restored too); imp 4 matches nothing
    val i2 = Seq((3L, 3L, ts("2024-01-01 00:04:00")),
      (4L, 9L, ts("2024-01-01 00:07:00")))

    val tmp = java.nio.file.Files.createTempDirectory("ssj_rec").toString
    def start(iIn: MemoryStream[(Long, Long, Timestamp)],
              cIn: MemoryStream[(Long, Long, Timestamp)], tag: String) =
      graft.streaming.StreamJoin.attributeClicks(
          iIn.toDF().toDF("imp_id", "imp_key", "imp_ts"),
          cIn.toDF().toDF("click_id", "click_key", "click_ts"),
          "imp_key", "click_key", "imp_ts", "click_ts",
          watermark = "1 hour", maxDelaySeconds = 600)
        .select(col("imp_id"), col("click_id"))
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", s"$tmp/out_$tag")
        .option("checkpointLocation", s"$tmp/ckpt_$tag").start()

    // run A: uninterrupted
    val iA = MemoryStream[(Long, Long, Timestamp)]
    val cA = MemoryStream[(Long, Long, Timestamp)]
    val qA = start(iA, cA, "a")
    iA.addData(i0); qA.processAllAvailable()
    cA.addData(c1); qA.processAllAvailable()
    iA.addData(i2); qA.processAllAvailable()
    val shapeA = stateShape(qA)
    qA.stop()

    // run B: stop after the impressions batch; the clicks land while down
    val iB = MemoryStream[(Long, Long, Timestamp)]
    val cB = MemoryStream[(Long, Long, Timestamp)]
    val qB1 = start(iB, cB, "b")
    iB.addData(i0); qB1.processAllAvailable()
    qB1.stop()
    cB.addData(c1) // no query running
    val qB2 = start(iB, cB, "b") // SAME checkpoint, SAME sink
    qB2.processAllAvailable()    // drains c1 against the RESTORED imp buffer
    iB.addData(i2); qB2.processAllAvailable()
    val shapeB = stateShape(qB2)
    qB2.stop()

    def out(tag: String): Seq[(Long, Long)] =
      spark.read.parquet(s"$tmp/out_$tag").select("imp_id", "click_id")
        .as[(Long, Long)].collect().toSeq
    val a = out("a"); val b = out("b")
    assert(b.size === b.toSet.size, "restart must not re-emit any pair")
    assert(b.toSet === a.toSet,
      "restarted output must equal the uninterrupted run's")
    // the two restored-state matches, asserted directly
    assert(b.toSet === Set((1L, 100L), (3L, 101L)))
    assert(shapeB === shapeA, s"join state differs: A=$shapeA B=$shapeB")
  }

  test("TWS session restart: the ListState buffer AND the registered close " +
    "timer restore — a key untouched after the restart still closes from " +
    "its restored timer with its pre-stop membership; output parity",
    LongRun) {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> graft.streaming.Frontier.RocksDbProvider) {
      import graft.streaming.TwsSessions
      import graft.streaming.TwsSessions.Session
      implicit val sqlCtx = spark.sqlContext
      // pre-stop: k has an open 2-event session, q an open 1-event session
      val b0 = Seq(("k", ts("2024-01-01 00:00:00")),
        ("k", ts("2024-01-01 00:00:04")),
        ("q", ts("2024-01-01 00:00:02")))
      // arrives while run B is down: k extends (needs the restored buffer);
      // q gets NOTHING ever again — its close can only come from the
      // RESTORED timer firing, there is no input row to re-arm it
      val b1 = Seq(("k", ts("2024-01-01 00:00:08")),
        ("zz", ts("2024-01-01 01:00:00")))
      val b2 = Seq(("zz", ts("2024-01-01 01:00:01")))
      val b3 = Seq(("zz", ts("2024-01-01 01:00:02")))

      val tmp = java.nio.file.Files.createTempDirectory("tws_sess_rec").toString
      def start(in: MemoryStream[(String, Timestamp)], tag: String) =
        TwsSessions.sessions(
            in.toDF().toDF("key", "ts").withWatermark("ts", "1 second"),
            "key", "ts", gapSeconds = 10)
          .writeStream.outputMode(OutputMode.Append)
          .format("parquet").option("path", s"$tmp/out_$tag")
          .option("checkpointLocation", s"$tmp/ckpt_$tag").start()

      val inA = MemoryStream[(String, Timestamp)]
      val qA = start(inA, "a")
      Seq(b0, b1, b2, b3).foreach { b => inA.addData(b); qA.processAllAvailable() }
      qA.stop()

      val inB = MemoryStream[(String, Timestamp)]
      val qB1 = start(inB, "b")
      inB.addData(b0); qB1.processAllAvailable()
      qB1.stop()
      inB.addData(b1) // lands while down
      val qB2 = start(inB, "b")
      qB2.processAllAvailable()
      Seq(b2, b3).foreach { b => inB.addData(b); qB2.processAllAvailable() }
      qB2.stop()

      def out(tag: String): Set[Session] =
        spark.read.parquet(s"$tmp/out_$tag").as[Session].collect().toSet
      val a = out("a"); val b = out("b")
      assert(b === a, "restarted sessions must equal the uninterrupted run's")
      assert(b.contains(Session("k", ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:00:18"), 3L)),
        "k must close with the restored pre-stop buffer + the extension")
      assert(b.contains(Session("q", ts("2024-01-01 00:00:02"),
        ts("2024-01-01 00:00:12"), 1L)),
        "q never saw another row — only the RESTORED timer can close it")
    }
  }

  test("SCD2 foreachBatch merge restart: batchIds continue from the " +
    "checkpoint (no duplicate store version, no re-merged batch) and the " +
    "dimension converges to the batch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val b0 = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (2L, 15L, 3L, "X"))
    val b1 = Seq((1L, 30L, 4L, "B"), (3L, 25L, 5L, "Z"))
    val b2 = Seq((1L, 40L, 6L, "A"), (2L, 35L, 7L, "Y"))

    def run(tag: String, tmp: String,
            stopAfter: Option[Int]): graft.io.StageStore = {
      val store = new graft.io.StageStore(spark, s"$tmp/dim_$tag")
      val in = MemoryStream[(Long, Long, Long, String)]
      def start() = in.toDF().toDF("k", "t", "seq", "status")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/ckpt_$tag")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val upd = batch.select(col("k"), col("t"), col("seq"), col("status"))
          val merged =
            if (store.versions().isEmpty)
              ScdMerge.history(upd, Seq("k"), "t", "seq", Seq("status"))
            else ScdMerge.merge(store.readLatest(), upd,
              Seq("k"), "t", "seq", Seq("status"))
          store.write(merged, batchId + 1)
          ()
        }.start()
      val batches = Seq(b0, b1, b2)
      val q1 = start()
      val k = stopAfter.getOrElse(batches.size)
      batches.take(k).foreach { b => in.addData(b); q1.processAllAvailable() }
      q1.stop()
      if (k < batches.size) {
        batches.drop(k).take(1).foreach(in.addData(_)) // arrives while down
        val q2 = start()
        q2.processAllAvailable()
        batches.drop(k + 1).foreach { b => in.addData(b); q2.processAllAvailable() }
        q2.stop()
      }
      store
    }

    val tmp = java.nio.file.Files.createTempDirectory("scd2_rec").toString
    val storeA = run("a", tmp, stopAfter = None)
    val storeB = run("b", tmp, stopAfter = Some(1))

    def dim(st: graft.io.StageStore): Set[(Long, String, Long, Option[Long], Boolean)] =
      st.readLatest()
        .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    // batchId continuation: versions 1..3 exactly once in BOTH runs — a
    // replayed batch after restart would re-mint an existing version
    assert(storeB.versions().sorted === Seq(1L, 2L, 3L))
    assert(storeA.versions().sorted === Seq(1L, 2L, 3L))
    assert(dim(storeB) === dim(storeA))
    // convergence: the incremental result IS the full rebuild
    val rebuild = ScdMerge.history(
        (b0 ++ b1 ++ b2).toDF("k", "t", "seq", "status"),
        Seq("k"), "t", "seq", Seq("status"))
      .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(dim(storeB) === rebuild)
  }
}
