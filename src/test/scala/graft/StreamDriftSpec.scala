package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.DriftMonitor

/** Streaming PSI drift monitor: per-trigger parity with the batch
  * psiDrift over the stream-so-far, across micro-batch boundaries. */
class StreamDriftSpec extends SparkTestBase {

  import spark.implicits._

  private def batchPsi(refRows: Seq[String], curRows: Seq[String]): Map[String, (Long, Long, Double)] =
    graft.ext.CorpusOps.psiDrift(
        refRows.zipWithIndex.map(_.swap).toDF("id", "src"),
        curRows.zipWithIndex.map(_.swap).toDF("id", "src"),
        col("src"), col("src"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("psiQuery: per-trigger PSI equals the batch operator over the " +
    "stream-so-far, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val refRows = Seq("a", "a", "a", "b")
    val refCounts = refRows.zipWithIndex.map(_.swap).toDF("id", "bin")
      .groupBy("bin").agg(count(lit(1)).as("n_ref"))
    val in = MemoryStream[String]
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[Map[String, (Long, Long, Double)]]
    val q = DriftMonitor.psiQuery(in.toDF().toDF("src"), col("src"),
        refCounts, trigger = Trigger.ProcessingTime(0)) { (psi: DataFrame, _) =>
      seen += psi.as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    }.start()
    in.addData("a", "b", "b")
    q.processAllAvailable()
    in.addData("c", "b")
    q.processAllAvailable()
    q.stop()
    assert(seen.size >= 2, s"expected one PSI frame per micro-batch, got $seen")
    assert(seen.head === batchPsi(refRows, Seq("a", "b", "b")),
      "first trigger must equal batch PSI over batch-1 rows")
    assert(seen.last === batchPsi(refRows, Seq("a", "b", "b", "c", "b")),
      "final trigger must equal batch PSI over the whole stream")
  }

  test("psiAgainst: a bin unseen in the stream still contributes (smoothed)") {
    val ref = Seq(("a", 3L), ("b", 1L)).toDF("bin", "n_ref")
    val cur = Seq(("a", 2L)).toDF("bin", "n_cur")
    val got = DriftMonitor.psiAgainst(ref, cur, alpha = 0.5)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("b")._3 === 0L)
    assert(got("b")._4 > 0 && !got("b")._4.isInfinite)
  }
}
