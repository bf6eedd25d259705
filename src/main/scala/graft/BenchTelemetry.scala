package graft

import java.util.Locale

/** Shared measurement-telemetry primitives for Bench/BenchSubset.
  *
  * Three pollution signatures show up on the shared driver machine, and
  * each needs its own field because each is blind to the others:
  *   - foreign load (la): 1-min loadavg >> the bench's own thread count;
  *   - inconsistent reps (spread): deterministic work timed >1.5x apart;
  *   - CPU STEAL (cw): the hypervisor deschedules the whole VM, so wall
  *     grows while the process accrues no CPU — loadavg stays LOW (the
  *     runqueue is empty, the machine just isn't running) and reps agree
  *     (the steal is sustained), which is exactly the r17 x_rollup case
  *     (16x slow, la=1.3, spread=1.08) the first two fields missed.
  *     cw = process-CPU-time / wall of the quoted (min) rep: any Spark
  *     query through the noop sink keeps >= 1 core busy end-to-end, so a
  *     healthy local-mode rep has cw >= ~1; cw << 1 means the process
  *     spent most of the wall not scheduled at all.
  * Run-level /proc/stat steal+iowait deltas corroborate machine-wide.
  */
object BenchTelemetry {
  def la1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative CPU nanos of THIS JVM (all threads — in local[n] mode the
    * executor pool is in-process, so this covers the actual query work). */
  def procCpuNanos(): Long =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    } catch { case _: Throwable => -1L }

  /** Machine-wide (steal, iowait, total) jiffies from /proc/stat line 1:
    * cpu user nice system idle iowait irq softirq steal guest guest_nice.
    * Total sums only user..steal (first 8 fields): the kernel already
    * folds guest/guest_nice into user, so summing all fields would
    * double-count guest time and understate steal%/iowait% on hosts
    * running nested guests. */
  def cpuJiffies(): Option[(Long, Long, Long)] =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
      Some((f.lift(7).getOrElse(0L), f.lift(4).getOrElse(0L), f.take(8).sum))
    } catch { case _: Throwable => None }

  /** steal%/iowait% of total machine jiffies between two cpuJiffies()
    * samples; (-1,-1) when /proc/stat is unreadable. */
  def stealIowaitPct(start: Option[(Long, Long, Long)],
                     end: Option[(Long, Long, Long)]): (Double, Double) =
    (start, end) match {
      case (Some((s0, w0, t0)), Some((s1, w1, t1))) if t1 > t0 =>
        (100.0 * (s1 - s0) / (t1 - t0), 100.0 * (w1 - w0) / (t1 - t0))
      case _ => (-1.0, -1.0)
    }

  /** Locale-pinned decimal formatting: the f-interpolator uses the JVM
    * default locale, which under a comma-decimal locale would emit
    * invalid JSON (1,234 instead of 1.234). */
  def fmt(v: Double, places: Int): String =
    String.format(Locale.ROOT, s"%.${places}f", Double.box(v))

  /** Drop EVERY cached block in the session: the catalog cache (persist()
    * frames, freed by clearCache) AND directly-persisted RDD blocks —
    * localCheckpoint() pins its partitions as storage blocks that
    * clearCache cannot see, so a long entry sequence accumulates them
    * until GC/ContextCleaner gets around to it (the r19 32-core-timeout
    * suspect). Safe at an entry boundary: every bench rep rebuilds its
    * frames from scratch, so no live computation references the dropped
    * blocks. Unpersist is non-blocking — the subsequent listener drain /
    * query start gives the cleanup time to land. */
  def freeCachedBlocks(spark: org.apache.spark.sql.SparkSession): Unit = {
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    try spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    catch { case _: Throwable => () }
  }

  /** Number of RDDs currently holding storage blocks — the per-entry
    * trail for the block-accumulation failure mode: if this climbs
    * monotonically across entries, cleanup is not keeping up. */
  def storageBlocks(spark: org.apache.spark.sql.SparkSession): Int =
    try spark.sparkContext.getPersistentRDDs.size
    catch { case _: Throwable => -1 }

  /** Per-entry stage-metric counters for the two axes that survive both
    * CPU steal and foreign load — the r18 verdict's binding gap was that
    * the committed artifact had no way to COMPARE rounds through a steal
    * era (q_tpch1 committed 1.39 s vs 0.79 s isolated, on unchanged
    * code; wall is noise-bound in both directions on this machine):
    *   - shuffle-write records: a property of the PLAN, bit-identical
    *     across machines and rounds for unchanged code+data;
    *   - executor CPU nanos (TaskMetrics.executorCpuTime): work
    *     actually burned, unchanged when the JVM is descheduled, and —
    *     unlike the driver-process cw — measured on the EXECUTOR side,
    *     so it stays meaningful under local-cluster where the driver's
    *     own CPU says nothing about the query (the r18 cluster rows'
    *     blind spot).
    * The listener bus is async, so totals are read after [[drain]]:
    * poll until the counters hold still for 3 consecutive 100 ms
    * windows (a single quiet window misreads a bus stall as "done" —
    * the GrowthProbe lesson), capped so a pathological stall cannot
    * wedge the bench. */
  final class EntryCounters(sc: org.apache.spark.SparkContext) {
    private val shufRecA = new java.util.concurrent.atomic.AtomicLong
    private val execCpuA = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shufRecA.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          execCpuA.addAndGet(m.executorCpuTime)
        }
      }
    })
    def drain(capMs: Long = 5000): Unit = {
      val t0 = System.nanoTime()
      var snap = (-1L, -1L); var same = 0
      while (same < 3 && (System.nanoTime() - t0) / 1e6 < capMs) {
        Thread.sleep(100)
        val cur = (shufRecA.get, execCpuA.get)
        if (cur == snap) same += 1 else { same = 0; snap = cur }
      }
    }
    def reset(): Unit = { shufRecA.set(0L); execCpuA.set(0L) }
    def shufRec: Long = shufRecA.get
    def execCpuS: Double = execCpuA.get / 1e9
  }
}
