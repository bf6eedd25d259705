package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.DedupOps
import graft.streaming.StreamDedup

/** Row-local SimHash + streaming near-dup suppression. */
class StreamDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("simhashCol equals the batch simhash aggregate on every document") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox! jumps over THE lazy dog."), // same token set as 1
      (4L, "sphinx of black quartz judge my vow"),
      (5L, "a b c d e f g"),
      (6L, "one"))
      .toDF("doc_id", "text")
    val batch = DedupOps.simhash(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    val local = docs.select(col("doc_id"), DedupOps.simhashCol(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(local.view.filterKeys(batch.contains).toMap === batch)
    // punctuation/case variants share the signature
    assert(local(1L) === local(3L))
  }

  test("streaming near-dup dedup: signature-equal variants collapse, state " +
    "evicts past the watermark (re-emission)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamDedup.nearDupDedup(
        in.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sndd_out").start()
    in.addData((1L, "the quick brown fox", ts("2024-01-01 00:00:00")),
      (2L, "an entirely different document", ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    // punctuation variant of doc 1 within the watermark -> suppressed
    in.addData((3L, "The quick... brown FOX!", ts("2024-01-01 00:30:00")))
    q.processAllAvailable()
    // advance the watermark past doc 1's horizon
    in.addData((4L, "watermark advancer text", ts("2024-01-01 05:00:00")))
    q.processAllAvailable()
    // same signature again after eviction -> re-emits (state is bounded)
    in.addData((5L, "the quick brown fox", ts("2024-01-01 04:30:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sndd_out").select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 4L, 5L))
  }

  test("streaming near-dup dedup: null-text and token-less rows are dropped, " +
    "not collapsed into shared null/zero signatures") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamDedup.nearDupDedup(
        in.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sndd_null_out").start()
    in.addData(
      (1L, null.asInstanceOf[String], ts("2024-01-01 00:00:00")),
      (2L, "!!!", ts("2024-01-01 00:01:00")),   // tokenless
      (3L, "???", ts("2024-01-01 00:02:00")),   // tokenless, distinct from 2
      (4L, "a real document", ts("2024-01-01 00:03:00")))
    q.processAllAvailable()
    q.stop()
    // without the guard, rows 2/3 would share signature 0 (one survivor)
    // and row 1 a null signature; with it, only real text flows through
    val got = spark.table("sndd_null_out").select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(4L))
  }

  test("streaming cdc-chunk dedup: a header-shifted re-crawl emits ONLY " +
    "its novel chunks (batch-parity boundaries); eviction re-emits") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shifted = "breaking news update " + base // header shifts every offset
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamDedup.cdcChunkDedup(
        in.toDF().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", "1 hour", k = 3, divisor = 4, maxLen = 8)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("scdc_out").start()
    in.addData((1L, base, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    in.addData((2L, shifted, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    // boundaries must be the BATCH cdcChunks boundaries (shared derivation)
    def batchOf(id: Long, text: String): Set[String] =
      graft.ext.TextOps.cdcChunks(Seq((id, text)).toDF("doc_id", "text"),
          col("doc_id"), col("text"), k = 3, divisor = 4, maxLen = 8)
        .select("chunk_md5").as[String].collect().toSet
    val aChunks = batchOf(1L, base)
    val bChunks = batchOf(2L, shifted)
    // CDC shift-resistance precondition: despite the offset shift, the
    // re-crawl SHARES most chunk hashes and has a genuinely novel head
    assert((bChunks intersect aChunks).size >= 2, s"$bChunks vs $aChunks")
    assert((bChunks diff aChunks).nonEmpty)
    val got = spark.table("scdc_out")
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
    assert(got.filter(_._1 == 1L).map(_._2).toSet === aChunks)
    assert(got.filter(_._1 == 2L).map(_._2).toSet === (bChunks diff aChunks),
      "the re-crawl must emit exactly its novel spans")
    // advance the watermark past doc 1's horizon, resend it verbatim:
    // every chunk re-emits — state is bounded by the watermark
    in.addData((3L, "advancer", ts("2024-01-01 05:00:00")))
    q.processAllAvailable()
    in.addData((4L, base, ts("2024-01-01 04:30:00")))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("scdc_out").where(col("doc_id") === 4L)
      .select("chunk_md5").as[String].collect().toSet
    assert(after === aChunks)
  }
}
