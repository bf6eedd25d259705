package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale-growth probe: run the named queries at `SPARK_GRAFT_SF_DIR` and
  * report, per query, min-of-reps wall seconds PLUS the volume counters a
  * growth curve needs to be attributable rather than anecdotal:
  *
  *   - `outRows`      — result cardinality (did the WORK grow, or just
  *                      the scan?)
  *   - `shufRecords`/`shufMB` — total shuffle-write volume across all
  *                      stages of one run: the direct proxy for candidate-
  *                      pair volume in the join-heavy operators (a prefix
  *                      filter that stopped pruning shows up here long
  *                      before wall-clock caves)
  *   - `inMB`         — bytes read from the source tables
  *
  * Run at 1x/10x/50x fixtures and divide: time ratios alone can hide a
  * superlinear candidate blowup behind fixed job overhead, and shuffle
  * ratios alone can hide a verify stage gone quadratic in per-candidate
  * cost — the pair separates scan growth, candidate growth, and
  * per-candidate cost. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=$PWD/tmp/sf5 \
  *     sbt "runMain graft.GrowthProbe x_setsim_join x_longmatch_dedup"
  *
  * Counters are from the LAST rep (they are deterministic across reps —
  * asserted by the flakehunt discipline); time is the min across reps
  * (the load-robust estimate, the BenchSubset convention). */
object GrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_NO_BCAST=1 pins every join to its shuffle form: growth
    // ratios across fixtures are only attributable when both points run
    // the same plan regime (AQE's broadcast->SMJ demotion between scales
    // otherwise shows up as a one-time shuffle-record jump that reads as
    // superlinear growth — the r16 x_setsim_join lesson)
    val bcast = if (sys.env.contains("SPARK_GRAFT_NO_BCAST")) "-1" else "10MB"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", bcast)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", bcast)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufRec = new AtomicLong
    val shufBytes = new AtomicLong
    val inBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    // the listener bus is async — poll until counters hold for THREE
    // consecutive 500 ms windows (1.5 s quiet). One stable window was not
    // enough on a loaded machine: a bus-delivery stall longer than 500 ms
    // read as "stable" and silently truncated the final rep's counters —
    // the exact attribution signal this tool exists to make reliable.
    def drain(): Unit = {
      var snap = (-1L, -1L, -1L); var same = 0
      while (same < 3) {
        Thread.sleep(500)
        val cur = (shufRec.get, shufBytes.get, inBytes.get)
        if (cur == snap) same += 1 else { same = 0; snap = cur }
      }
    }

    val mb = 1024.0 * 1024.0
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val outRows = fn(spark, sfDir).count() // also the codegen/JIT warm-up
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ts = (1 to reps).map { i =>
        if (i == reps) { drain(); shufRec.set(0); shufBytes.set(0); inBytes.set(0) }
        val t = once()
        if (i == reps) drain()
        t
      }
      println(f"[growth] $name sf=$sfDir outRows=$outRows " +
        f"min=${ts.min}%.2f reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"shufRecords=${shufRec.get} shufMB=${shufBytes.get / mb}%.1f " +
        f"inMB=${inBytes.get / mb}%.1f")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        val df = fn(spark, sfDir)
        df.collect()
        println(s"[growth-plan] $name\n" +
          df.queryExecution.executedPlan.toString.take(20000))
      }
    }
    spark.stop()
  }
}
