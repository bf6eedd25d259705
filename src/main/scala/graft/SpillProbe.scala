package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe: run the named queries ONCE each under whatever
  * heap the caller constrained (`SPARK_DRIVER_MEM`, the -Xmx of the forked
  * JVM) and report, per query, wall seconds + the engine's spill response:
  * `memSpill`/`diskSpill` (bytes the operators spilled rather than OOMed)
  * and `peakExecMem` (max per-stage execution memory). The 100-TB question
  * this answers is not "is it fast" but "does the heavy operator DEGRADE
  * to disk instead of DYING when the memory envelope shrinks" — run it at
  * the derived 10x fixture with a heap several times smaller than the
  * default 8g:
  *
  *   SPARK_DRIVER_MEM=2g SPARK_GRAFT_SF_DIR=$PWD/tmp/sf1 \
  *     sbt "runMain graft.SpillProbe x_setsim_join q_tpch8 q_tpch9"
  *
  * A query that throws is reported with its error, not hidden — an OOM
  * here is a real finding. Metrics arrive on the async listener bus; each
  * query waits for the bus to drain before reading its counters. */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val peak = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peak.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    val mb = 1024.0 * 1024.0
    args.foreach { name =>
      memSpill.set(0); diskSpill.set(0); peak.set(0)
      val t0 = System.nanoTime()
      val res = scala.util.Try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // the listener bus is async (and private) — poll until the counters
      // are stable for 500 ms so late stage-completed events land
      var snap = (-1L, -1L, -1L)
      var same = 0
      while (same < 1) {
        Thread.sleep(500)
        val cur = (memSpill.get, diskSpill.get, peak.get)
        if (cur == snap) same += 1 else { same = 0; snap = cur }
      }
      val err = res.failed.toOption.map { e =>
        s" err=${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator
            .take(1).mkString.take(160)
      }.getOrElse("")
      println(f"[spill] $name ok=${res.isSuccess} sec=$secs%.2f " +
        f"memSpillMB=${memSpill.get / mb}%.1f " +
        f"diskSpillMB=${diskSpill.get / mb}%.1f " +
        f"peakExecMemMB=${peak.get / mb}%.1f$err")
    }
    spark.stop()
  }
}
