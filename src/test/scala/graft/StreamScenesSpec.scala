package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.MultimodalOps
import graft.streaming.StreamScenes

/** Scene segmentation, window-free and streaming: the in-row form must be
  * bit-identical to the batch window form on the real corpus, the plan
  * must be map-only, and the streaming surface must reproduce the batch
  * numbers row-for-row (stateless — no watermark needed). */
class StreamScenesSpec extends SparkTestBase {

  import spark.implicits._

  private type SceneRow = (Long, Int, Long, Option[Long], Boolean)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[SceneRow] =
    df.select(col("doc_id").cast("long"), col("frame_idx").cast("int"),
        col("ahash").cast("long"), col("hamming").cast("long"),
        col("is_scene_start"))
      .as[SceneRow].collect().toSet

  private def corpus = spark.read.parquet(sf() + "/documents.parquet")
    .where(col("text").isNotNull)
    .withColumn("payload", col("text").cast("binary"))

  test("sceneChangesInRow is bit-identical to the batch window form on " +
    "the real corpus") {
    val batch = canon(MultimodalOps.sceneChanges(
      corpus, "doc_id", "payload", frames = 6, threshold = 8))
    val inRow = canon(MultimodalOps.sceneChangesInRow(
      corpus, "doc_id", "payload", frames = 6, threshold = 8))
    assert(batch.nonEmpty)
    assert(inRow === batch)
  }

  test("sceneChangesInRow: hand case — identical windows are never scene " +
    "starts, a byte flip past the threshold is") {
    // payload of 64 bytes: two 32-byte halves, identical -> hamming 0
    val same = ("ABCDEFGH" * 8).getBytes("UTF-8")
    val got = MultimodalOps.sceneChangesInRow(
        Seq((1L, same)).toDF("doc_id", "payload"),
        "doc_id", "payload", frames = 2, threshold = 0)
      .orderBy("frame_idx")
      .select("frame_idx", "hamming", "is_scene_start")
      .as[(Int, Option[Long], Boolean)].collect().toSeq
    assert(got === Seq((0, None, true), (1, Some(0L), false)))
  }

  test("in-row scene plan is map-only: no Window, no Exchange") {
    val p = MultimodalOps.sceneChangesInRow(
        corpus, "doc_id", "payload", frames = 6, threshold = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("streaming scene segmentation reproduces the batch rows (stateless " +
    "append, no watermark)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.take(200)
    val in = MemoryStream[(Long, String)]
    val q = StreamScenes.sceneStream(
        in.toDF().toDF("doc_id", "text")
          .withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", frames = 6, threshold = 8)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("scenes_out").start()
    in.addData(rows.take(100))
    q.processAllAvailable()
    in.addData(rows.drop(100)) // a second micro-batch: no cross-batch state
    q.processAllAvailable()
    q.stop()
    val ids = rows.map(_._1).toSet
    val batch = canon(MultimodalOps.sceneChanges(
      corpus.where(col("doc_id").isin(ids.toSeq: _*)),
      "doc_id", "payload", frames = 6, threshold = 8))
    assert(canon(spark.table("scenes_out")) === batch)
  }
}
