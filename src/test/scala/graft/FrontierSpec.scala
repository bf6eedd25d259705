package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Frontier

/** The composed crawl frontier — urlDedup → perHostAdmitDocs →
  * cdcChunkDedup as ONE query: cross-stage causality (a deduped spelling
  * must not consume budget; a denied fetch's content must never reach the
  * chunk state), batch-parity of the emitted chunk sets against the batch
  * cdcChunks derivation, per-stage state shapes from the query's own
  * progress, and whole-chain eviction (everything re-emits after the
  * watermark passes). */
class FrontierSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def doc(prefix: String): String =
    (1 to 40).map(i => s"$prefix$i").mkString(" ")

  private def chunksOf(text: String): Set[String] =
    graft.ext.TextOps.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 3, divisor = 4, maxLen = 8)
      .select("chunk_md5").as[String].collect().toSet

  test("crawlFrontier: dedup shields the budget, denial shields the chunk " +
    "state, chunk emissions match the batch derivation, all three states " +
    "bounded and evicted", LongRun) {
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val docA = doc("a"); val docB = doc("b")
      val docC = doc("c"); val docD = doc("d")
      val shifted = "hdr fresh update " + docA
      val in = MemoryStream[(String, String, Timestamp)]
      val q = Frontier.crawlFrontier(
          in.toDF().toDF("url", "text", "ts"), "url", "text", "ts",
          watermark = "1 hour", windowSeconds = 60, maxPerWindow = 2,
          k = 3, divisor = 4, maxLen = 8)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("frontier_out").start()

      // batch 1, all in window 00:00, host-a budget 2:
      //   p1 admits; the p1 RE-SPELLING dies at urlDedup (so p2 still
      //   fits the budget — the causal proof the dedup ran first); p3 is
      //   DENIED at the budget, so docC must never reach the chunker;
      //   host b has its own budget
      in.addData(
        ("http://a.example.com/p/1?utm_source=x", docA, ts("2024-01-01 00:00:01")),
        ("HTTP://A.Example.COM:80/p/1", docA, ts("2024-01-01 00:00:02")),
        ("http://a.example.com/p/2", docB, ts("2024-01-01 00:00:03")),
        ("http://a.example.com/p/3", docC, ts("2024-01-01 00:00:04")),
        ("http://b.example.com/p/1", docD, ts("2024-01-01 00:00:05")))
      q.processAllAvailable()
      // batch 2, next window (fresh budget): p4 re-crawls docA under a
      // NEW url — admitted, but every chunk is already seen → emits
      // nothing; p5 is the shifted re-crawl — only its header chunks are
      // novel
      in.addData(
        ("http://a.example.com/p/4", docA, ts("2024-01-01 00:01:10")),
        ("http://a.example.com/p/5", shifted, ts("2024-01-01 00:01:11")))
      q.processAllAvailable()

      val cA = chunksOf(docA); val cB = chunksOf(docB)
      val cC = chunksOf(docC); val cD = chunksOf(docD)
      val cS = chunksOf(shifted)
      // shift-resistance precondition (the StreamDedupSpec contract)
      assert((cS intersect cA).size >= 2 && (cS diff cA).nonEmpty)

      def emitted(): Map[String, Set[String]] =
        spark.table("frontier_out").select("url", "chunk_md5")
          .as[(String, String)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = emitted()
      assert(got("http://a.example.com/p/1") === cA)
      assert(got("http://a.example.com/p/2") === cB)
      assert(got("http://b.example.com/p/1") === cD)
      // denied fetch: no chunk of docC anywhere
      assert(!got.contains("http://a.example.com/p/3"))
      assert(got.values.flatten.toSet.intersect(cC).isEmpty)
      // full re-crawl under a new url: admitted, zero novel chunks
      assert(!got.contains("http://a.example.com/p/4"))
      // shifted re-crawl: exactly the novel header spans
      assert(got("http://a.example.com/p/5") === (cS diff cA))

      // per-stage state shapes, from the query's own progress: three
      // stateful operators; the budget operator holds TWO LIVE HOSTS (not
      // fetches); the two dedup operators hold 6 canonical urls and
      // |union of seen chunk hashes| respectively
      val ops = q.lastProgress.stateOperators
        .map(o => o.operatorName -> o.numRowsTotal).toSeq
      assert(ops.size === 3, ops.toString)
      assert(ops.count(_._1.contains("transformWithState")) === 1,
        ops.toString)
      val tws = ops.find(_._1.contains("transformWithState")).get._2
      assert(tws === 2L, s"budget state must be live hosts, got $ops")
      val dedups = ops.filter(_._1.contains("dedupe")).map(_._2).sorted
      assert(dedups === Seq(6L, (cA ++ cB ++ cD ++ cS).size.toLong),
        s"url seen-set and chunk seen-set, got $ops")

      // advance the watermark far past every horizon, then resend p1
      // verbatim: all three states must have evicted, so it re-admits and
      // re-emits ALL of docA's chunks
      in.addData(("http://c.example.com/adv", doc("e"), ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      in.addData(("http://a.example.com/p/1", docA, ts("2024-01-01 05:30:00")))
      q.processAllAvailable()
      q.stop()
      val again = spark.table("frontier_out")
        .where(col("url") === "http://a.example.com/p/1")
        .where(col("ts") === ts("2024-01-01 05:30:00"))
        .select("chunk_md5").as[String].collect().toSet
      assert(again === cA, "post-eviction re-crawl must re-emit every chunk")
    }
  }

  test("crawlFrontier refuses to build without the RocksDB state store " +
    "(the transformWithState requirement is surfaced early)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Timestamp)]
    val e = intercept[IllegalArgumentException] {
      Frontier.crawlFrontier(in.toDF().toDF("url", "text", "ts"),
        "url", "text", "ts", "1 hour", 60, 2)
    }
    assert(e.getMessage.contains("RocksDB"))
  }
}
