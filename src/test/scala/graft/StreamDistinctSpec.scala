package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.SketchOps
import graft.streaming.StreamDistinct
import graft.streaming.StreamDistinct.KeyedHash

/** Streaming KMV distinct counter: per-trigger parity with the batch
  * sketch over the stream-so-far, across micro-batch boundaries. */
class StreamDistinctSpec extends SparkTestBase {

  import spark.implicits._

  private def hashOf(keys: Seq[(String, String)]): Seq[KeyedHash] =
    keys.zipWithIndex.map(_._1).map { case (g, v) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      KeyedHash(g, java.lang.Long.parseLong(hex, 16))
    }

  private def batchEst(keys: Seq[(String, String)], k: Int): Map[String, (Int, Long)] =
    SketchOps.kmvEstimate(SketchOps.kmvState(
        keys.toDF("g", "v"), col("g"), col("v"), k), k)
      .as[(String, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("streaming estimates equal the batch sketch over the stream-so-far") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val b1 = (0 until 200).map(i => ("s", s"a${i % 40}")) ++
      (0 until 30).map(i => ("t", s"b$i"))
    val b2 = (0 until 200).map(i => ("s", s"c$i")) // new keys grow the set
    val in = MemoryStream[KeyedHash]
    val q = StreamDistinct.run(in.toDS(), k)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("kmv_stream_out").start()
    in.addData(hashOf(b1))
    q.processAllAvailable()
    val after1 = spark.sql("SELECT * FROM kmv_stream_out")
      .as[(String, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after1 === batchEst(b1, k), "trigger 1 must match batch on batch-1")
    in.addData(hashOf(b2))
    q.processAllAvailable()
    val latest = spark.sql(
        "SELECT stratum, k_used, n_distinct_est FROM kmv_stream_out")
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).map { case (g, v) => g -> v.last }  // last emit per key
    q.stop()
    val want = batchEst(b1 ++ b2, k)
    // 's' was re-emitted with the merged state; 't' keeps its batch-1 value
    assert(latest("s")._2 === want("s")._1 && latest("s")._3 === want("s")._2)
  }

  test("state is k-bounded however many distinct keys stream past") {
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val in = MemoryStream[KeyedHash]
    val q = StreamDistinct.run(in.toDS(), k)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("kmv_bound_out").start()
    in.addData(hashOf((0 until 500).map(i => ("s", s"v$i"))))
    q.processAllAvailable()
    val st = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    assert(st === 1L, "one state row per stratum, k-bounded buffer inside")
    val got = spark.sql("SELECT k_used FROM kmv_bound_out")
      .as[Int].collect().last
    assert(got === k)
  }
}
