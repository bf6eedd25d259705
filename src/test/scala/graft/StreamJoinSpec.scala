package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

/** Stream-stream event-time join: batch parity, interval semantics, state
  * eviction on BOTH buffered sides, and left-outer null emission gated on
  * the watermark. The restart-recovery case lives in RecoverySpec with the
  * other checkpoint-restart proofs. */
class StreamJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val imps = Seq(
    (10L, 1L, ts("2024-01-01 00:00:00")),  // matched by clicks 100, 101
    (11L, 1L, ts("2024-01-01 00:20:00")),  // matched by click 102
    (12L, 2L, ts("2024-01-01 00:00:00")),  // same times, other key
    (13L, 3L, ts("2024-01-01 00:05:00")))  // never clicked
  private val clicks = Seq(
    (100L, 1L, ts("2024-01-01 00:02:00")), // in imp 10's window
    (101L, 1L, ts("2024-01-01 00:10:00")), // boundary: exactly +10 min
    (102L, 1L, ts("2024-01-01 00:25:00")), // in imp 11's window only
    (103L, 2L, ts("2024-01-01 00:11:00")), // 11 min after imp 12 — outside
    (104L, 2L, ts("2023-12-31 23:59:00"))) // BEFORE imp 12 — no attribution

  private val expectedPairs = Set((10L, 100L), (10L, 101L), (11L, 102L))

  private def impsDF(rows: Seq[(Long, Long, Timestamp)]) =
    rows.toDF("imp_id", "imp_key", "imp_ts")
  private def clicksDF(rows: Seq[(Long, Long, Timestamp)]) =
    rows.toDF("click_id", "click_key", "click_ts")

  test("batch form: the same definition on static frames — window is " +
    "[impTs, impTs + delay], inclusive both ends, per key") {
    val got = StreamJoin.attributeClicks(impsDF(imps), clicksDF(clicks),
        "imp_key", "click_key", "imp_ts", "click_ts", "1 hour", 600)
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === expectedPairs)
  }

  test("streaming inner join matches the batch form whichever side's rows " +
    "arrive first (symmetric buffering), across interleaved micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val iIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamJoin.attributeClicks(
        iIn.toDF().toDF("imp_id", "imp_key", "imp_ts"),
        cIn.toDF().toDF("click_id", "click_key", "click_ts"),
        "imp_key", "click_key", "imp_ts", "click_ts", "1 hour", 600)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_inner").start()
    // clicks 100/104 arrive BEFORE any impression — must buffer and match
    // when the impression side catches up
    cIn.addData(clicks(0), clicks(4)); q.processAllAvailable()
    iIn.addData(imps(0), imps(2)); q.processAllAvailable()
    iIn.addData(imps(1), imps(3)); q.processAllAvailable()
    cIn.addData(clicks(1), clicks(2), clicks(3)); q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_inner").select("imp_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(got === expectedPairs)
  }

  test("state eviction: once the watermark passes an impression's match " +
    "window, its buffered row leaves the join state (numRowsTotal drops) — " +
    "state is bounded by watermark + interval, not by stream length") {
    implicit val sqlCtx = spark.sqlContext
    val iIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamJoin.attributeClicks(
        iIn.toDF().toDF("imp_id", "imp_key", "imp_ts"),
        cIn.toDF().toDF("click_id", "click_key", "click_ts"),
        "imp_key", "click_key", "imp_ts", "click_ts", "10 minutes", 600)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_evict").start()
    iIn.addData((1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 2L, ts("2024-01-01 00:00:30")))
    cIn.addData((9L, 9L, ts("2024-01-01 00:00:10")))
    q.processAllAvailable()
    val before = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(before === 3L, s"all three rows buffered, got $before")
    // advance BOTH watermarks far past every buffered row's horizon; a
    // second batch commits the eviction
    iIn.addData((3L, 1L, ts("2024-01-01 05:00:00")))
    cIn.addData((10L, 9L, ts("2024-01-01 05:00:00")))
    q.processAllAvailable()
    iIn.addData((4L, 1L, ts("2024-01-01 05:00:01")))
    cIn.addData((11L, 9L, ts("2024-01-01 05:00:01")))
    q.processAllAvailable()
    val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    assert(after < before + 4,
      s"pre-horizon rows were never evicted: before=$before after=$after")
    assert(after === 4L,
      s"exactly the four fresh rows should remain buffered, got $after")
  }

  test("left_outer: an unclicked impression emits null-extended EXACTLY " +
    "once, and only after the watermark closes its window — not on arrival") {
    implicit val sqlCtx = spark.sqlContext
    val iIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamJoin.attributeClicks(
        iIn.toDF().toDF("imp_id", "imp_key", "imp_ts"),
        cIn.toDF().toDF("click_id", "click_key", "click_ts"),
        "imp_key", "click_key", "imp_ts", "click_ts", "10 minutes", 600,
        joinType = "left_outer")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_outer").start()
    iIn.addData((1L, 1L, ts("2024-01-01 00:00:00")),   // will match
      (2L, 3L, ts("2024-01-01 00:00:00")))             // never clicked
    cIn.addData((100L, 1L, ts("2024-01-01 00:02:00")))
    q.processAllAvailable()
    def rows() = spark.table("ssj_outer")
      .select(col("imp_id"), col("click_id"))
      .as[(Long, Option[Long])].collect().toSet
    // match emits immediately; the null row must NOT — imp 2's window is
    // still open (a click could arrive until 00:10 + watermark)
    assert(rows() === Set((1L, Some(100L))),
      "null-extension emitted before the watermark closed the window")
    // push both watermarks past 00:10 + 10 min; second batch finalizes
    iIn.addData((3L, 1L, ts("2024-01-01 01:00:00")))
    cIn.addData((101L, 9L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    iIn.addData((4L, 1L, ts("2024-01-01 01:00:01")))
    cIn.addData((102L, 9L, ts("2024-01-01 01:00:01")))
    q.processAllAvailable()
    q.stop()
    assert(rows().contains((2L, None)),
      "unclicked impression never emitted after its window closed")
    assert(rows().count(_._1 == 2L) === 1, "null row must emit exactly once")
  }

  test("guards: shared column names, bad join type, non-positive delay") {
    val i = impsDF(imps)
    intercept[IllegalArgumentException] {
      StreamJoin.attributeClicks(i, i, "imp_key", "imp_key",
        "imp_ts", "imp_ts", "1 hour", 600)
    }
    intercept[IllegalArgumentException] {
      StreamJoin.attributeClicks(i, clicksDF(clicks), "imp_key", "click_key",
        "imp_ts", "click_ts", "1 hour", 600, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      StreamJoin.attributeClicks(i, clicksDF(clicks), "imp_key", "click_key",
        "imp_ts", "click_ts", "1 hour", 0)
    }
  }
}
